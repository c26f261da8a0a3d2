"""Probe the JAX persistent compilation cache on the axon TPU backend
(VERDICT r4 #4: the 2-8 min remote compiles are the biggest per-experiment
tax; JAX_COMPILATION_CACHE_DIR 'appeared to hang' once in round 1 — one
datapoint, never diagnosed).

Run twice in SEPARATE processes (the tunnel is single-client — never two
at once):

  env JAX_PLATFORMS="" timeout 600 python scripts/compile_cache_probe.py
  env JAX_PLATFORMS="" timeout 600 python scripts/compile_cache_probe.py

Process 1 pays the remote compile and (if the backend supports executable
serialization) populates the cache; process 2's compile time tells whether
the cache hits. `--big` uses a heavier program (deeper loop + larger GEMMs)
closer to the bench sampler's compile cost. `--dir` overrides the cache
location. Prints one RESULT line for docs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/repo/.jax_cache")
    ap.add_argument("--big", action="store_true")
    ap.add_argument("--clear", action="store_true",
                    help="wipe the cache dir first (fresh baseline)")
    args = ap.parse_args()

    if args.clear and os.path.isdir(args.dir):
        import shutil

        shutil.rmtree(args.dir)
    os.makedirs(args.dir, exist_ok=True)
    before = set(os.listdir(args.dir))

    import jax

    jax.config.update("jax_compilation_cache_dir", args.dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    t_dev = time.perf_counter() - t0
    print(f"[probe] backend {jax.default_backend()} device {dev} "
          f"(discovery {t_dev:.1f} s)")

    depth = 96 if args.big else 24
    width = 1024 if args.big else 512

    @jax.jit
    def f(x, w):
        def body(i, x):
            return jnp.tanh(x @ w) * 1.001 + x

        return jax.lax.fori_loop(0, depth, body, x)

    x = jnp.ones((width, width), jnp.bfloat16)
    w = jnp.eye(width, dtype=jnp.bfloat16) * 0.5

    t0 = time.perf_counter()
    f(x, w).block_until_ready()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    f(x, w).block_until_ready()
    t_warm = time.perf_counter() - t0

    after = set(os.listdir(args.dir))
    wrote = sorted(after - before)
    print(f"RESULT first_call={t_first:.2f}s warm_call={t_warm:.3f}s "
          f"cache_entries_before={len(before)} new_entries={len(wrote)} "
          f"dir={args.dir}")
    if wrote:
        for w_ in wrote[:3]:
            sz = os.path.getsize(os.path.join(args.dir, w_))
            print(f"[probe]   wrote {w_} ({sz} bytes)")


if __name__ == "__main__":
    main()
