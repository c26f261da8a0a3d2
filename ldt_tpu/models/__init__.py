"""Model zoo: latent set-VAE Compressor + latent-DiT Score network."""

from ldt_tpu.models.compressor import Compressor
from ldt_tpu.models.score import ConditionNet, Score

__all__ = ["Compressor", "ConditionNet", "Score"]
