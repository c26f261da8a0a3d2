"""Shared NN blocks: the set-transformer ResidualBlock family.

TPU-native re-design of the reference's `model/layers.py` (Negai-98/LDT). The
reference is channels-first torch `Conv1d(k=1)` code; here everything is
channels-last `[B, N, C]` flax.linen with `Dense` layers, so XLA lays tensors
out natively for the MXU and fuses the AdaLN modulations into the matmuls.

Parity notes (reference file:line):
  * `TimeEmbedding`     — model/layers.py:14-41 (sinusoidal -> 2-layer SiLU MLP)
  * `LabelEmbedding`    — model/layers.py:44-52
  * `ActNorm`           — model/layers.py:55-107. Data-dependent init happens at
    `Module.init` time via data-dependent param initializers (the idiomatic JAX
    analog of the reference's first-training-batch `data_init`).
  * `MLP`               — model/layers.py:110-133
  * `ResidualBlock`     — model/layers.py:140-229: Q from x, KV from y (self- or
    cross-attention), AdaLN shift/scale/gate conditioning (6-param, or 2+4 when
    dim_in != dim_out), or additive pos-embedding conditioning when AdaLN=False.
  * `FinalLayer`        — model/layers.py:232-248 (AdaLN 2-param output head)
  * `get_activation` / norms — tools/utils.py:104-124,168-181
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class Dense(nn.Module):
    """`nn.Dense` with torch `nn.Linear`'s DEFAULT initialization.

    The reference never calls its `initialize_weights` (commented out at
    model/scorenet/score.py:98 and model/Compressor/Network.py:161), so every
    Linear/Conv1d trains from torch defaults: kaiming-uniform(a=sqrt(5))
    kernels (std 0.577/sqrt(fan_in)) and uniform(+-1/sqrt(fan_in)) biases.
    flax's lecun_normal kernels are 1.73x larger per matmul; through the
    Compressor's ~14 pre-norm residual blocks that factor COMPOUNDS into a
    ~500-1000x activation blowup at init (measured: encoder max ~2-5k and
    mean KL ~6e3 vs the torch reference's 3.8 and 0.044 on the same batch) —
    large enough to trip the reference's hard-coded 10000 max-activation
    watchdog within two epochs at flagship config. Same param names/shapes
    as `nn.Dense` (checkpoints interchangeable).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (fan_in, self.features), self.param_dtype)
        bias = None
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)

            def bias_init(key, shape, dtype=self.param_dtype):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            bias = self.param("bias", bias_init, (self.features,),
                              self.param_dtype)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel,
                                (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


def get_activation(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """Activation registry (reference tools/utils.py:104-124)."""
    if name is None:
        return lambda x: x
    name = name.lower()
    table = {
        "gelu": jax.nn.gelu,
        "selu": jax.nn.selu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "hardswish": jax.nn.hard_swish,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
        "leakyrelu0.2": lambda x: jax.nn.leaky_relu(x, 0.2),
        "relu": jax.nn.relu,
    }
    if name not in table:
        # the reference raises on unknown names (tools/utils.py:123-124);
        # a silent relu fallback would train the wrong activation on a typo
        raise NotImplementedError(f"activation not supported: {name}")
    return table[name]


def make_norm(norm: Optional[str], features: int, groups: int = 16,
              elementwise_affine: bool = False, dtype: Dtype = jnp.float32):
    """Norm registry over the channel (last) axis.

    Mirrors reference tools/utils.py:168-181: layer_norm / group_norm /
    batch_norm / None. Returns a linen Module (or None for identity).
    """
    if norm is None:
        return None
    norm = norm.lower()
    if norm == "layer_norm":
        return nn.LayerNorm(epsilon=1e-6, use_bias=elementwise_affine,
                            use_scale=elementwise_affine, dtype=dtype)
    if norm == "group_norm":
        return nn.GroupNorm(num_groups=min(features // 4, groups),
                            epsilon=1e-6, dtype=dtype)
    if norm == "batch_norm":
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, dtype=dtype)
    raise TypeError(f"norm not supported: {norm}")


def sinusoidal_embedding(ts: jax.Array, dim: int,
                         max_period: float = 10000.0) -> jax.Array:
    """`TimeEmbedding.calc_t_emb` parity (model/layers.py:20-36).

    ts: `[B]` (float times or integer steps) -> `[B, dim]` = [sin | cos].
    """
    assert dim % 2 == 0
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(max_period) / (half - 1))
    )
    args = ts.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


class TimeEmbedding(nn.Module):
    """Sinusoidal time embedding + 2-layer SiLU MLP (model/layers.py:14-41)."""

    dim_embed: int
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        h = sinusoidal_embedding(t, self.dim_embed).astype(self.dtype)
        h = Dense(self.dim_out, dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return Dense(self.dim_out, dtype=self.dtype)(h)


class LabelEmbedding(nn.Module):
    """Category embedding + MLP (model/layers.py:44-52)."""

    num_categories: int
    dim_embed: int
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, label: jax.Array) -> jax.Array:
        h = nn.Embed(self.num_categories, self.dim_embed, dtype=self.dtype,
                     embedding_init=nn.initializers.normal(1.0))(label)
        h = Dense(self.dim_out, dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return Dense(self.dim_out, dtype=self.dtype)(h)


class ActNorm(nn.Module):
    """Activation normalization with data-dependent init (model/layers.py:55-107).

    `z = (x - shift) * exp(-log_scale)` over the feature (last) axis.

    The reference initializes shift/log_scale from the first training batch and
    tracks an `initialized` buffer; here the same statistics are computed inside
    the param initializers, which in JAX run exactly once — at `Module.init`
    with the batch the caller supplies. Loading a checkpoint replaces the params
    wholesale, which subsumes the reference's `init()` after-load protocol.

    feature_type='set' pools stats over batch*points per feature ([1,1,F]
    params); anything else uses per-(token,feature) stats ([1,S,F] params).
    """

    num_features: int
    z_scale: int = 1
    data_dep_init: bool = True
    eps: float = 1e-6
    feature_type: str = "set"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [B, N, F], channels-last.
        if self.feature_type == "set":
            shape = (1, 1, self.num_features)
            reduce_axes = (0, 1)
        else:
            shape = (1, self.z_scale, self.num_features)
            reduce_axes = (0,)

        if self.data_dep_init:
            # stats in f32 so the PARAMS stay f32 even when the activations
            # run bf16 (mixed-precision training, common.train_dtype)
            def shift_init(key, x=x):
                return jnp.mean(x.astype(jnp.float32), axis=reduce_axes,
                                keepdims=True).reshape(shape)

            def log_scale_init(key, x=x):
                std = jnp.std(x.astype(jnp.float32), axis=reduce_axes,
                              keepdims=True, ddof=1)
                return jnp.log(std + self.eps).reshape(shape)
        else:
            shift_init = nn.initializers.zeros
            log_scale_init = nn.initializers.zeros

        shift = self.param("shift", shift_init, *(() if self.data_dep_init else (shape,)))
        log_scale = self.param(
            "log_scale", log_scale_init, *(() if self.data_dep_init else (shape,))
        )
        return (x - shift) * jnp.exp(-log_scale)


class MLP(nn.Module):
    """1x1-conv MLP, channels-last (model/layers.py:110-133)."""

    dim_hidden: int
    dim_out: int
    n_hidden: int = 1
    activation: Optional[str] = "gelu"
    residual: bool = False
    dropout_p: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        act = get_activation(self.activation)
        h = x
        for _ in range(self.n_hidden):
            h = act(Dense(self.dim_hidden, dtype=self.dtype)(h))
            if self.dropout_p > 0:
                h = nn.Dropout(self.dropout_p)(h, deterministic=deterministic)
        h = Dense(self.dim_out, dtype=self.dtype)(h)
        if self.residual:
            if x.shape[-1] != self.dim_out:
                x = Dense(self.dim_out, dtype=self.dtype, name="shortcut")(x)
            h = h + x
        return h


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """AdaLN modulation (model/layers.py:136)."""
    return x * (1 + scale) + shift


class Attention(nn.Module):
    """Multi-head scaled dot-product attention, Q from x / KV from y.

    The `compute_attention` core of the reference ResidualBlock
    (model/layers.py:183-200). Softmax runs in float32 regardless of compute
    dtype; the matmuls hit the MXU.
    """

    dim_out: int
    num_heads: int
    dropout_p: float = 0.0
    fused_core: bool = False
    # Reproduce the reference's head merge: `(w @ v).reshape(B, N, C)` on a
    # [B, H, N, dh] tensor (model/layers.py:197) — a reshape WITHOUT the
    # transpose, i.e. a fixed scramble that mixes tokens into channels. It
    # cannot be folded into fc_o (it permutes across tokens), so checkpoints
    # trained under it (all released reference weights) only reproduce their
    # outputs under the same merge. Off by default — our framework trains
    # with the standard merge; turn on via Score/Compressor(ref_merge=True)
    # when running weights imported by ldt_tpu/tools/port.py.
    ref_merge: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        d = self.dim_out
        h = self.num_heads
        dh = d // h
        dense_q = Dense(d, dtype=self.dtype, name="fc_q")
        dense_kv = Dense(2 * d, dtype=self.dtype, name="fc_kv")
        att = None
        fused_core = self.fused_core and not self.ref_merge
        tp_mesh = None
        if fused_core:
            # Under a tensor-parallel `model` axis, GSPMD REPLICATES a Pallas
            # custom call it cannot partition — so the fused core is only
            # used where it can run shard-locally: the packed self-attention
            # path with whole heads per shard (fused_attention_packed_tp).
            # Anything else (cross-attention, non-dividing heads) falls back
            # to XLA attention, which partitions cleanly.
            from ldt_tpu.parallel.tp import attention_tp_mesh

            tp_mesh = attention_tp_mesh()
        packed = fused_core and x is y and not self.is_initializing()
        if tp_mesh is not None:
            from ldt_tpu.ops.pallas_attention import tp_attention_supported

            if not (packed and tp_attention_supported(h, d, tp_mesh)):
                packed = False
                fused_core = False
        if packed:
            # self-attention fast path: q and kv come from the SAME input, so
            # run one [D, 3D] GEMM against the concatenated kernels instead
            # of two launches (param tree unchanged: kernels read from the
            # fc_q/fc_kv Dense scopes created during init), and hand the
            # PACKED output straight to the Pallas kernel — no lane-slice
            # ops, no materialized q/k/v copies.
            from ldt_tpu.ops.pallas_attention import (
                fused_attention_packed, fused_attention_packed_tp)

            pq = self.get_variable("params", "fc_q")
            pkv = self.get_variable("params", "fc_kv")
            interp = jax.default_backend() != "tpu"
            if tp_mesh is not None:
                # per-shard packing: a GLOBAL [D,3D] concat would interleave
                # q/kv channels across model shards (see the TP wrapper)
                att = fused_attention_packed_tp(
                    x.astype(self.dtype),
                    pq["kernel"].astype(self.dtype),
                    pq["bias"].astype(self.dtype),
                    pkv["kernel"].astype(self.dtype),
                    pkv["bias"].astype(self.dtype),
                    h, tp_mesh, interp)
            else:
                w = jnp.concatenate([pq["kernel"], pkv["kernel"]],
                                    axis=1).astype(self.dtype)
                bias = jnp.concatenate([pq["bias"],
                                        pkv["bias"]]).astype(self.dtype)
                qkv = x.astype(self.dtype) @ w + bias
                att = fused_attention_packed(qkv, h, interp)
        else:
            q = dense_q(x)        # [B, N, D]
            kv = dense_kv(y)      # [B, M, 2D]
            k, v = kv[..., :d], kv[..., d:]
            b, n, _ = q.shape
            m = k.shape[1]
        if att is not None:
            pass
        elif fused_core:
            # Pallas kernel: per-head lane slices in VMEM, no HBM relayouts,
            # any N x M, differentiable via a Pallas backward kernel
            # (ldt_tpu/ops/pallas_attention.py); params identical to the
            # XLA path.
            from ldt_tpu.ops.pallas_attention import fused_attention

            att = fused_attention(q, k, v, h,
                                  jax.default_backend() != "tpu")
        else:
            if self.ref_merge:
                # reference split: reshape(B, C, N)-style — channels-first
                # [C, N].reshape(H, dh, N) means head h owns channel rows
                # [h*dh:(h+1)*dh], same as ours, BUT merged back with the
                # token-scrambling reshape (see class docstring)
                q = q.reshape(b, n, h, dh)
                k = k.reshape(b, m, h, dh)
                v = v.reshape(b, m, h, dh)
                w = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (dh ** -0.5)
                w = jax.nn.softmax(w.astype(jnp.float32),
                                   axis=-1).astype(self.dtype)
                att = jnp.einsum("bhnm,bmhd->bhnd", w, v).reshape(b, n, d)
            else:
                q = q.reshape(b, n, h, dh)
                k = k.reshape(b, m, h, dh)
                v = v.reshape(b, m, h, dh)
                w = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (dh ** -0.5)
                w = jax.nn.softmax(w.astype(jnp.float32),
                                   axis=-1).astype(self.dtype)
                att = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(b, n, d)
        att = Dense(d, dtype=self.dtype, name="fc_o")(att)
        if self.dropout_p > 0:
            att = nn.Dropout(self.dropout_p)(att, deterministic=deterministic)
        return att


class ResidualBlock(nn.Module):
    """Set-transformer block with AdaLN conditioning (model/layers.py:140-229).

    forward(x [B,N,C], y [B,M,Dkv] or None, c [B,Dc] or [B,N,Dc] or None):
      * AdaLN path: x = shortcut(x) + gate_msa * Attn(modulate(norm1(x)), y)
                    x = x + gate_mlp * MLP(modulate(norm2(x)))
        (6-param adaLN when dim_in == dim_out, else 2-param + 4-param heads —
         model/layers.py:213-219)
      * pos-embedding path (AdaLN=False): additive conditioning
        (model/layers.py:220-223)
      * unconditional: pre-norm + activation (model/layers.py:224-226)

    When y is None the block self-attends; NOTE the reference passes the *raw*
    pre-norm x as keys/values when calling `layer(x, x, c)` — keep that calling
    convention at the call sites.
    """

    dim_in: int
    dim_c: Optional[int] = None
    num_heads: int = 4
    norm: Optional[str] = "layer_norm"
    mlp_ratio: float = 4.0
    dropout_att: float = 0.0
    dropout_mlp: float = 0.0
    rescale: bool = False
    dim_out: Optional[int] = None
    AdaLN: bool = True
    act: Optional[str] = None
    fused_attention: bool = False
    ref_merge: bool = False  # reference head-merge compat (see Attention)
    dtype: Dtype = jnp.float32

    def compute_mods(self, c: jax.Array) -> jax.Array:
        """Evaluate only the AdaLN head(s) for conditioning `c` [S, Dc].

        Returns the concatenated modulation vector ([S, 6*dim] or
        [S, 2*dim_in + 4*dim_out]). Used to hoist time-conditioning out of
        the 1000-step sampling scan: the modulations depend on t alone, so
        they can be precomputed for every step at once (see
        `Score.precompute_mods`). Reads the params created by `__call__`
        (a compact module allows only one module-constructing method).
        """
        dim_out = self.dim_out if self.dim_out is not None else self.dim_in
        assert self.AdaLN and self.dim_c is not None
        c = jax.nn.silu(c)

        def dense(name, v):
            p = self.get_variable("params", name)
            return (v @ p["kernel"].astype(self.dtype)
                    + p["bias"].astype(self.dtype))

        if self.dim_in == dim_out:
            return dense("adaLN", c)
        return jnp.concatenate([dense("adaLN1", c), dense("adaLN2", c)],
                               axis=-1)

    @nn.compact
    def __call__(self, x: jax.Array, y: Optional[jax.Array] = None,
                 c: Optional[jax.Array] = None, *,
                 mods: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        dim_out = self.dim_out if self.dim_out is not None else self.dim_in
        affine = self.dim_c is None
        norm1 = make_norm(self.norm, self.dim_in, elementwise_affine=affine,
                          dtype=self.dtype)
        norm2 = make_norm(self.norm, dim_out, elementwise_affine=affine,
                          dtype=self.dtype)
        n1 = norm1 if norm1 is not None else (lambda v: v)
        n2 = norm2 if norm2 is not None else (lambda v: v)
        act = get_activation(self.act)
        attn = Attention(dim_out, self.num_heads, self.dropout_att,
                         fused_core=self.fused_attention,
                         ref_merge=self.ref_merge,
                         dtype=self.dtype, name="attn")
        mlp = MLP(int(self.mlp_ratio * dim_out), dim_out, n_hidden=1,
                  dropout_p=self.dropout_mlp, dtype=self.dtype, name="mlp")

        def shortcut(v):
            if dim_out != self.dim_in:
                return Dense(dim_out, dtype=self.dtype, name="shortcut")(v)
            return v

        if c is not None or mods is not None:
            if c is not None and c.ndim == 2:
                c = c[:, None, :]  # [B, 1, Dc] broadcast over tokens
            if self.AdaLN:
                if mods is not None:
                    # precomputed modulations ([..., 6*dim] etc.); reshape to
                    # broadcast over [B, N, dim]
                    while mods.ndim < 3:
                        mods = mods[None]
                    if self.dim_in == dim_out:
                        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
                         gate_mlp) = jnp.split(mods, 6, axis=-1)
                    else:
                        shift_msa, scale_msa = jnp.split(
                            mods[..., : 2 * self.dim_in], 2, axis=-1)
                        gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
                            mods[..., 2 * self.dim_in:], 4, axis=-1)
                elif self.dim_in == dim_out:
                    m = Dense(6 * dim_out, dtype=self.dtype,
                                 name="adaLN")(jax.nn.silu(c))
                    (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp,
                     gate_mlp) = jnp.split(m, 6, axis=-1)
                else:
                    m1 = Dense(2 * self.dim_in, dtype=self.dtype,
                                  name="adaLN1")(jax.nn.silu(c))
                    shift_msa, scale_msa = jnp.split(m1, 2, axis=-1)
                    m2 = Dense(4 * dim_out, dtype=self.dtype,
                                  name="adaLN2")(jax.nn.silu(c))
                    gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
                        m2, 4, axis=-1)
                q_in = modulate(n1(x), shift_msa, scale_msa)
                x = shortcut(x) + gate_msa * attn(
                    q_in, y if y is not None else q_in,
                    deterministic=deterministic)
                x = x + gate_mlp * mlp(modulate(n2(x), shift_mlp, scale_mlp),
                                       deterministic=deterministic)
            else:
                pos = Dense(self.dim_in, dtype=self.dtype,
                               name="pos_embedding")(jax.nn.silu(c))
                x = act(n1(x)) + pos
                x = shortcut(x) + attn(x, y if y is not None else x,
                                       deterministic=deterministic)
                x = x + mlp(act(n2(x)), deterministic=deterministic)
        else:
            q_in = act(n1(x))
            x = shortcut(x) + attn(q_in, y if y is not None else q_in,
                                   deterministic=deterministic)
            x = x + mlp(act(n2(x)), deterministic=deterministic)
        if self.rescale:
            x = x / math.sqrt(2.0)
        return x


class FinalLayer(nn.Module):
    """AdaLN output head (model/layers.py:232-248)."""

    dim_out: int
    dim_c: Optional[int] = None
    norm: Optional[str] = "layer_norm"
    dtype: Dtype = jnp.float32

    def compute_mods(self, c: jax.Array) -> jax.Array:
        """AdaLN head only (see ResidualBlock.compute_mods)."""
        p = self.get_variable("params", "adaLN")
        return (jax.nn.silu(c) @ p["kernel"].astype(self.dtype)
                + p["bias"].astype(self.dtype))

    @nn.compact
    def __call__(self, x: jax.Array, c: Optional[jax.Array] = None, *,
                 mods: Optional[jax.Array] = None) -> jax.Array:
        affine = self.dim_c is None
        norm = make_norm(self.norm, x.shape[-1], elementwise_affine=affine,
                         dtype=self.dtype)
        n = norm if norm is not None else (lambda v: v)
        if mods is not None:
            while mods.ndim < 3:
                mods = mods[None]
            shift, scale = jnp.split(mods, 2, axis=-1)
            x = modulate(n(x), shift, scale)
            return Dense(self.dim_out, dtype=self.dtype, name="ln")(x)
        if c is not None:
            if c.ndim == 2:
                c = c[:, None, :]
            m = Dense(2 * x.shape[-1], dtype=self.dtype,
                         name="adaLN")(jax.nn.silu(c))
            shift, scale = jnp.split(m, 2, axis=-1)
            x = modulate(n(x), shift, scale)
            return Dense(self.dim_out, dtype=self.dtype, name="ln")(x)
        return Dense(self.dim_out, dtype=self.dtype, name="ln")(n(x))
