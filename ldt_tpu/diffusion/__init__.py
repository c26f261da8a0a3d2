"""Continuous/discrete diffusion processes and on-device samplers."""

from ldt_tpu.diffusion.sde import (
    DiffusionBase,
    DiffusionGeometric,
    DiffusionSubVPSDE,
    DiffusionVESDE,
    DiffusionVPSDE,
    make_diffusion,
)
from ldt_tpu.diffusion.sampling import sample_discrete, sample_model_ode

__all__ = [
    "DiffusionBase",
    "DiffusionGeometric",
    "DiffusionSubVPSDE",
    "DiffusionVESDE",
    "DiffusionVPSDE",
    "make_diffusion",
    "sample_discrete",
    "sample_model_ode",
]
