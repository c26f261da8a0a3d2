"""LDT-TPU: a TPU-native (JAX/XLA/Pallas) latent diffusion framework for 3D point
cloud generation, re-designed from scratch with the capabilities of the LDT
reference (Negai-98/LDT).

Subpackages
-----------
- ``ldt_tpu.ops``        geometry / transport primitives (FPS, kNN, chamfer, EMD)
                         replacing the reference's five CUDA extensions.
- ``ldt_tpu.nn``         shared neural blocks (AdaLN set-transformer, ActNorm, ...).
- ``ldt_tpu.models``     the Compressor set-VAE and the Score latent-DiT.
- ``ldt_tpu.diffusion``  continuous SDE family + fully-jitted samplers.
- ``ldt_tpu.training``   trainers, EMA, schedules, checkpointing, CSV logging.
- ``ldt_tpu.data``       ShapeNet-55 and ShapeNet-ViPC loaders (numpy, host-side).
- ``ldt_tpu.eval``       generative metrics (MMD/COV/1-NNA over CD+EMD, JSD, F1).
- ``ldt_tpu.parallel``   device-mesh / sharding helpers (dp x tp over ICI).
- ``ldt_tpu.tools``      config / logging / profiling / visualization.
"""

__version__ = "0.1.0"
