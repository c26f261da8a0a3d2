"""Scratch: decompose sampler step cost on TPU (not part of the package)."""
import time

import jax
import jax.numpy as jnp

from ldt_tpu.configs import compressor_cfg, score_cfg, sde_cfg
from ldt_tpu.diffusion import make_diffusion
from ldt_tpu.models import Compressor, Score


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    return (time.perf_counter() - t0) / n


def main():
    batch = 64
    scfg = score_cfg()
    sde = make_diffusion(sde_cfg())
    score = Score(scfg, dtype=jnp.bfloat16)
    k = jax.random.key(0)
    x = jax.random.normal(k, (batch, scfg.z_scale, scfg.z_dim))
    t = jnp.full((batch,), 0.5)
    params = score.init(k, x, t)["params"]

    fwd = jax.jit(lambda p, x, t: score.apply({"params": p}, x, t))
    dt = timeit(fwd, params, x, t)
    print(f"score fwd (B={batch}): {dt*1e3:.3f} ms -> "
          f"{dt*1000:.1f} s / 1000 steps")

    # one ancestral step incl. RNG
    def anc_step(p, x, t_scalar, key):
        tv = jnp.full((batch,), t_scalar)
        pred = score.apply({"params": p}, x, tv)
        std = sde.std(tv)[:, None, None]
        s = -pred.astype(jnp.float32) / std
        idx = (t_scalar * 999).astype(jnp.int32)
        beta = sde.betas[idx]
        x_mean = (x + beta * s) / jnp.sqrt(1 - beta)
        return x_mean + jnp.sqrt(beta) * jax.random.normal(key, x.shape)

    anc = jax.jit(anc_step)
    dt2 = timeit(anc, params, x, jnp.asarray(0.5), k)
    print(f"ancestral step: {dt2*1e3:.3f} ms")

    # bf16 fwd with x in bf16
    xb = x.astype(jnp.bfloat16)
    dt3 = timeit(fwd, params, xb, t)
    print(f"score fwd bf16 input: {dt3*1e3:.3f} ms")

    # decode cost
    ccfg = compressor_cfg()
    comp = Compressor(ccfg, dtype=jnp.bfloat16)
    cv = comp.init({"params": k, "sample": k}, jnp.zeros((2, 2048, 3)))
    eps = jax.random.normal(k, (batch, 32, 120))
    dec = jax.jit(lambda v, e, key: comp.apply(
        v, (batch, 2048), e, method=Compressor.sample,
        rngs={"sample": key}))
    dt4 = timeit(dec, cv, eps, k, n=5)
    print(f"decode (B={batch}, 2048 pts): {dt4*1e3:.3f} ms")


if __name__ == "__main__":
    main()
