from ldt_tpu.serving.int8 import (
    denoise_cond_int8,
    denoise_with_mods_int8,
    int8_matmul,
    precompute_cond_kv,
    quantize_cond_score_params,
    quantize_score_params,
)

__all__ = [
    "denoise_cond_int8",
    "denoise_with_mods_int8",
    "int8_matmul",
    "precompute_cond_kv",
    "quantize_cond_score_params",
    "quantize_score_params",
]
