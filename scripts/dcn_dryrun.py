"""Two-process DCN dryrun: drive `initialize_distributed()` for real.

The single-host 8-device dryrun (`__graft_entry__.dryrun_multichip`) covers
ICI-mesh semantics only; this script validates the MULTI-PROCESS plumbing
(`ldt_tpu/parallel/tp.py::initialize_distributed` reading
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) end-to-end:
2 CPU processes x 4 virtual devices each form one global {data:4, model:2}
mesh whose `data` axis spans the process (DCN) boundary, and a tiny
stage-2 train step + sequence-parallel decode run over the joint mesh —
the same program `dryrun_multichip` runs single-process.

Usage:
  python scripts/dcn_dryrun.py --launch     # spawns + checks both workers
  (worker mode is internal; the launcher sets the env and runs `--worker`)

Exercised per worker: jax.distributed.initialize via the library helper,
global-mesh construction through `make_mesh`, TP placement of params/Adam
moments/EMA across processes (host->global device_put in
`shard_train_state`), a data-sharded batch built with
`jax.make_array_from_process_local_data`, one jitted train step (grad psum
crosses the process boundary), and an SP decode. Exit 0 = everything
compiled and executed; any env-plumbing rot fails loudly (VERDICT r3 #4).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
LOCAL_DEVICES = 4


def worker() -> None:
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from ldt_tpu.parallel.tp import initialize_distributed

    assert initialize_distributed(), \
        "initialize_distributed() returned False with the DCN env set"
    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.local_devices()) == LOCAL_DEVICES, jax.local_devices()
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ldt_tpu.configs import compressor_cfg, score_cfg, sde_cfg
    from ldt_tpu.diffusion import make_diffusion
    from ldt_tpu.models import Compressor, Score
    from ldt_tpu.parallel.sp import set_sp_mesh
    from ldt_tpu.parallel.tp import (
        make_mesh,
        shard_replicated,
        shard_train_state,
    )
    from ldt_tpu.training.state import TrainState, apply_update, make_optimizer

    mesh = make_mesh(2)  # {data: 4, model: 2} over all 8 global devices
    assert mesh.shape == {"data": 4, "model": 2}, dict(mesh.shape)
    # the data axis must actually cross the process (DCN) boundary
    mesh_procs = {d.process_index for d in mesh.devices.flat}
    assert mesh_procs == set(range(N_PROC)), mesh_procs

    n_pts, z_scales, z_dim, hidden = 64, 8, 8, 64
    ccfg = compressor_cfg(outsize=n_pts, max_outputs=n_pts, z_dim=z_dim // 2,
                          z_scales=z_scales, hidden_dim=32, p_dim=32,
                          n_layers=2, encoder_layers=1, num_heads=2)
    scfg = score_cfg(z_dim=z_dim // 2 * 2, z_scale=z_scales,
                     hidden_size=hidden, num_heads=4, num_blocks=2, t_dim=32)
    sde = make_diffusion(sde_cfg(train_N=16, sample_N=16))
    compressor = Compressor(ccfg)
    score = Score(scfg)
    tx = make_optimizer(grad_clip=1.0)

    batch = 8
    rng = jax.random.key(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    # identical init on every process (same keys), leaves as host arrays so
    # device_put can place them into process-spanning shardings
    pts_host = np.zeros((batch, n_pts, 3), np.float32)
    comp_vars = jax.tree_util.tree_map(
        np.asarray, compressor.init({"params": k1, "sample": k2},
                                    jnp.asarray(pts_host)))
    z = jnp.zeros((batch, z_scales, scfg.z_dim))
    svars = jax.tree_util.tree_map(
        np.asarray, score.init(k3, z, jnp.ones((batch,))))
    state = TrainState.create(svars["params"], tx, ema=True)

    state = shard_train_state(state, mesh)
    comp_vars = shard_replicated(comp_vars, mesh)
    # some param must really be model-sharded across both processes
    tp_leaves = [x for x in jax.tree_util.tree_leaves(state.params)
                 if not x.sharding.spec == P()]
    assert tp_leaves, "no TP-sharded parameter leaves on the model axis"
    assert {d.process_index for d in tp_leaves[0].sharding.device_set} \
        == set(range(N_PROC))

    # batch: per-process local shard -> one global data-sharded array
    data_sharding = NamedSharding(mesh, P("data"))
    local = pts_host[:batch // N_PROC]  # same content; placement is the test
    pts = jax.make_array_from_process_local_data(data_sharding, local,
                                                 global_shape=pts_host.shape)

    timesteps = jnp.linspace(1.0, 1e-6, 16)

    @jax.jit
    def train_step(state, comp_vars, pts, rng):
        k_enc, k_t, k_eta = jax.random.split(rng, 3)
        out = compressor.apply(comp_vars, pts, rngs={"sample": k_enc})
        eps = jax.lax.stop_gradient(out["all_eps"])
        b = eps.shape[0]
        t = timesteps[jax.random.randint(k_t, (b,), 0, 16)]
        e2int = sde.e2int_f(t)[:, None, None]
        var = sde.var(t)[:, None, None]
        eta = jax.random.normal(k_eta, eps.shape)

        def loss_fn(params):
            xt = eps * e2int + jnp.sqrt(var) * eta
            pred = score.apply({"params": params}, xt, t)
            return jnp.mean(jnp.square(eta - pred))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = apply_update(state, grads, tx, 1e-4, ema_decay=0.999)
        return state, loss

    set_sp_mesh(mesh)

    @jax.jit
    def decode_step(comp_vars, eps):
        clouds = compressor.apply(comp_vars, (eps.shape[0], n_pts), eps,
                                  method=Compressor.sample)
        return jnp.isfinite(clouds).all(), clouds.shape

    with mesh:
        state, loss = train_step(state, comp_vars, pts, jax.random.key(1))
        loss.block_until_ready()
        eps = jax.random.normal(
            jax.random.key(2), (batch, z_scales, ccfg.n_layers * ccfg.z_dim))
        finite, _ = decode_step(comp_vars, eps)
    set_sp_mesh(None)

    assert loss.sharding.is_fully_replicated
    assert np.isfinite(float(loss)), float(loss)
    assert bool(finite), "SP decode produced non-finite clouds"
    print(f"DCN DRYRUN OK pid={jax.process_index()} "
          f"mesh={dict(mesh.shape)} loss={float(loss):.4f}", flush=True)


def launch() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(N_PROC):
        env = dict(os.environ)
        env.update(
            PALLAS_AXON_POOL_IPS="",  # never touch the TPU tunnel
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(f"--xla_force_host_platform_device_count"
                       f"={LOCAL_DEVICES}"),
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(N_PROC),
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n[launcher] TIMEOUT"
        ok = p.returncode == 0 and "DCN DRYRUN OK" in out
        print(f"--- worker {pid} rc={p.returncode} ---")
        print(out[-2000:])
        if not ok:
            rc = 1
    print("DCN LAUNCH " + ("OK" if rc == 0 else "FAILED"))
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--launch", action="store_true")
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    if args.worker:
        sys.path.insert(0, REPO)
        worker()
    else:
        sys.exit(launch())
