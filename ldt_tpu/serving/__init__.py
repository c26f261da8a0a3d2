from ldt_tpu.serving.int8 import (
    denoise_with_mods_int8,
    int8_matmul,
    quantize_score_params,
)

__all__ = ["denoise_with_mods_int8", "int8_matmul", "quantize_score_params"]
