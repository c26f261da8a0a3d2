"""Shared neural-net building blocks (flax.linen, channels-last)."""

from ldt_tpu.nn.layers import (
    ActNorm,
    FinalLayer,
    LabelEmbedding,
    MLP,
    ResidualBlock,
    TimeEmbedding,
    get_activation,
    make_norm,
    modulate,
)

__all__ = [
    "ActNorm",
    "FinalLayer",
    "LabelEmbedding",
    "MLP",
    "ResidualBlock",
    "TimeEmbedding",
    "get_activation",
    "make_norm",
    "modulate",
]
