"""Hierarchical attention set-VAE ("Compressor"), TPU-native.

Re-design of reference `model/Compressor/Network.py` + `model/Compressor/layers.py`
(Negai-98/LDT) in channels-last flax.linen. A 2048-point cloud is grouped by
FPS+kNN into `z_scales` (32) tokens, encoded by a stack of set-transformer
stages whose per-stage taps parameterize a hierarchy of latent posteriors, and
decoded by cross-attention from a learned 2048-seed initial set.

Latent layout parity: `all_eps` is `[B, z_scales, n_layers * z_dim]`
(= [B, 32, 120] at the reference config) with layer 0 of the *decode order*
occupying channels [0:z_dim] — identical to the reference's
`torch.cat(all_eps, dim=1).transpose(1, 2)` (Network.py:246) and consumed the
same way by `sample(given_eps)` (Network.py:251-268).

RNG streams: posterior reparameterization uses the linen rng collection
'sample'; pass `rngs={'sample': key}` to apply when running the stochastic
paths (forward with sampling, or `sample()` without `given_eps`).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ldt_tpu.nn.layers import (
    Dense,
    ActNorm,
    FinalLayer,
    LabelEmbedding,
    MLP,
    ResidualBlock,
    get_activation,
)
from ldt_tpu.ops.geometry import cluster, index_points
from ldt_tpu.parallel.sp import sp_shard

Dtype = Any

LOG_SQRT_2PI = 0.9189385332  # matches the truncated constant in Network.py:13,18


def log_p_var_normal(samples, mu, logvar):
    """Gaussian log-density (Network.py:12-14)."""
    return (-0.5 * jnp.square(samples - mu) / jnp.exp(logvar)
            - 0.5 * logvar - LOG_SQRT_2PI)


def log_p_normal(samples):
    """Standard-normal log-density (Network.py:17-19)."""
    return -0.5 * jnp.square(samples) - LOG_SQRT_2PI


def reparameterize(rng, mu, logvar):
    """mu + exp(logvar/2) * eps (Network.py:26-29)."""
    return mu + jnp.exp(logvar / 2.0) * jax.random.normal(rng, mu.shape, mu.dtype)


class MiniPointnet(nn.Module):
    """Tiny PointNet global embedding (Network.py:86-101).

    [B, N, in_dim] -> [B, output_dim] via Dense/BN/ReLU x2 + max-pool + Dense.
    """

    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h = Dense(128, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = Dense(256, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(h)
        h = jax.nn.relu(h)
        h = jnp.max(h, axis=1)  # [B, 256]
        return Dense(self.output_dim, dtype=self.dtype, name="fc")(h)


class ConvBNReLURes1D(nn.Module):
    """Residual Dense/BN block (model/Compressor/layers.py:129-156, groups=1)."""

    channel: int
    res_expansion: float = 1.0
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        act = get_activation(self.activation)
        h = Dense(int(self.channel * self.res_expansion), dtype=self.dtype,
                     name="net1_dense")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="net1_bn")(h)
        h = act(h)
        h = Dense(self.channel, dtype=self.dtype, name="net2_dense")(h)
        return act(h + x)


class PreExtraction(nn.Module):
    """Per-group feature extraction + max-pool (model/Compressor/layers.py:159-187).

    [B, S, K, D_in] -> [B, S, out_channels]. The (B, S) axes fold into the
    batch so the Dense layers run as one large MXU matmul.
    """

    out_channels: int
    blocks: int = 1
    res_expansion: float = 1.0
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        b, s, k, d = x.shape
        h = x.reshape(b * s, k, d)
        # ConvBNReLU1D "transfer" (layers.py:115-126)
        h = Dense(self.out_channels, dtype=self.dtype, name="transfer_dense")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="transfer_bn")(h)
        h = get_activation(self.activation)(h)
        for i in range(self.blocks):
            h = ConvBNReLURes1D(self.out_channels,
                                res_expansion=self.res_expansion,
                                activation=self.activation, dtype=self.dtype,
                                name=f"op{i}")(h, train=train)
        h = jnp.max(h, axis=1)  # adaptive_max_pool1d(·, 1)
        return h.reshape(b, s, self.out_channels)


class LocalGrouper(nn.Module):
    """FPS centers + kNN groups + normalized grouped features
    (model/Compressor/layers.py:271-319).

    __call__(xyz [B,N,3], feature [B,N,D], groups S, k) ->
        (new_xyz [B,S,3], new_feature [B,S,D])
    """

    in_channels: int
    use_xyz: bool = True
    normalize: Optional[str] = "anchor"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array, feature: jax.Array, groups: int, k: int,
                 *, train: bool = False):
        b = xyz.shape[0]
        norm_mode = self.normalize.lower() if self.normalize else None
        if norm_mode not in (None, "center", "anchor"):
            norm_mode = None
        add = 3 if self.use_xyz else 0

        new_xyz, fps_idx, idx = cluster(xyz, groups, k)
        new_feature = index_points(feature, fps_idx)       # [B, S, D]
        grouped_xyz = index_points(xyz, idx)               # [B, S, k, 3]
        grouped_feature = index_points(feature, idx)       # [B, S, k, D]
        if self.use_xyz:
            grouped_feature = jnp.concatenate(
                [grouped_feature, grouped_xyz], axis=-1)   # [B, S, k, D+3]
        if norm_mode is not None:
            if norm_mode == "center":
                mean = jnp.mean(grouped_feature, axis=2, keepdims=True)
            else:  # anchor
                mean = (jnp.concatenate([new_feature, new_xyz], axis=-1)
                        if self.use_xyz else new_feature)[:, :, None, :]
            # torch.std over the flattened per-cloud residuals, unbiased
            resid = (grouped_feature - mean).reshape(b, -1)
            std = jnp.std(resid, axis=-1, ddof=1)[:, None, None, None]
            grouped_feature = (grouped_feature - mean) / (std + 1e-5)
            alpha = self.param("affine_alpha", nn.initializers.ones,
                               (1, 1, 1, self.in_channels + add))
            beta = self.param("affine_beta", nn.initializers.zeros,
                              (1, 1, 1, self.in_channels + add))
            grouped_feature = alpha * grouped_feature + beta
        anchor = jnp.broadcast_to(
            new_feature[:, :, None, :],
            new_feature.shape[:2] + (k, new_feature.shape[-1]))
        x = jnp.concatenate([grouped_feature, anchor], axis=-1)
        x = PreExtraction(self.in_channels, dtype=self.dtype,
                          name="extraction")(x, train=train)
        return new_xyz, x


class InitialSet(nn.Module):
    """Learned seed set prior (model/Compressor/layers.py:12-43).

    With `max_outputs` set: a learned `[max_outputs, dim_seed]` table; when
    `num_points < max_outputs` a per-batch random subset of rows is taken
    (reference `sample_mask`, ops.py:6-14). With `max_outputs=None`: a
    mixture-of-Gaussians seed sampler.
    """

    dim_seed: int
    max_outputs: Optional[int]
    n_mixtures: int = 4

    @nn.compact
    def __call__(self, batch: int, num_points: int) -> jax.Array:
        if self.max_outputs is not None:
            prior = self.param(
                "prior", lambda k: jax.random.uniform(
                    k, (self.max_outputs, self.dim_seed)))
            if num_points >= self.max_outputs:
                return jnp.broadcast_to(prior[None], (batch,) + prior.shape)
            rng = self.make_rng("sample")
            keys = jax.random.split(rng, batch)
            sel = jax.vmap(
                lambda k: jax.random.permutation(k, self.max_outputs)[:num_points]
            )(keys)
            return jax.vmap(lambda s: prior[s])(sel)
        logits = self.param("logits", nn.initializers.ones, (self.n_mixtures,))
        mu = self.param("mu", nn.initializers.normal(1.0),
                        (self.n_mixtures, self.dim_seed))
        sig = self.param(
            "sig",
            lambda k: jnp.abs(jax.random.normal(
                k, (self.n_mixtures, self.dim_seed))) / math.sqrt(self.n_mixtures))
        rng = self.make_rng("sample")
        eps = jax.random.normal(
            rng, (batch, num_points, self.n_mixtures, self.dim_seed))
        x = (eps * sig[None, None] + mu[None, None]) * \
            jax.nn.softmax(logits)[None, None, :, None]
        x = x.sum(2)
        x = Dense(self.dim_seed)(x)
        x = jax.nn.silu(x)
        return Dense(self.dim_seed)(x)


class Encoder(nn.Module):
    """n x ResidualBlock + FinalLayer tap (Network.py:32-45)."""

    dim_in: int
    p_dim: int
    num_heads: int
    norm: Optional[str]
    mlp_ratio: float = 4.0
    dropout_p: float = 0.0
    num_layers: int = 1
    AdaLN: bool = True
    fused_attention: bool = False
    ref_merge: bool = False  # reference head-merge compat (nn/layers.py)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            # NOTE: keys/values are the raw pre-norm x (Network.py:43).
            x = ResidualBlock(
                self.dim_in, dim_c=self.p_dim, num_heads=self.num_heads,
                norm=self.norm, mlp_ratio=self.mlp_ratio,
                dropout_att=self.dropout_p, dropout_mlp=self.dropout_p,
                AdaLN=self.AdaLN, fused_attention=self.fused_attention,
                ref_merge=self.ref_merge, dtype=self.dtype, name=f"att{i}",
            )(x, x, pos, deterministic=deterministic)
        o = FinalLayer(self.dim_in, dim_c=self.p_dim, norm=self.norm,
                       dtype=self.dtype, name="conv_out")(x, pos)
        return x, o


class DecoderBlock(nn.Module):
    """Attentive Bottleneck Layer (Network.py:48-83).

    `compute_posterior(x, o, c)`: queries = encoder tap (z_scales tokens),
    keys/values = current decoded set -> (mu, logvar) heads.
    `__call__(o, eps, c)`: decoded set cross-attends to projected latents.
    """

    dim_in: int
    dim_z: int
    num_heads: int
    norm: Optional[str]
    mlp_ratio: float = 4.0
    dropout_p: float = 0.0
    min_sigma: float = -30.0
    act: Optional[str] = None
    c_dim: Optional[int] = None
    fused_attention: bool = False
    ref_merge: bool = False  # reference head-merge compat (nn/layers.py)
    dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(num_heads=self.num_heads, norm=self.norm,
                      mlp_ratio=self.mlp_ratio, dropout_att=self.dropout_p,
                      act=self.act, fused_attention=self.fused_attention,
                      ref_merge=self.ref_merge, dtype=self.dtype)
        self.att = ResidualBlock(self.dim_in, dim_c=self.c_dim, **common)
        self.prior_dense = Dense(2 * self.dim_z, dtype=self.dtype)
        self.att1 = ResidualBlock(self.dim_in, dim_c=self.c_dim, **common)
        self.ln = Dense(self.dim_in, dtype=self.dtype)

    def compute_posterior(self, x: jax.Array, o: Optional[jax.Array] = None,
                          c: Optional[jax.Array] = None, *,
                          deterministic: bool = True):
        x = self.att(x, o if o is not None else x, c,
                     deterministic=deterministic)
        posterior = self.prior_dense(jax.nn.silu(x))
        mu = posterior[..., : self.dim_z]
        logvar = jnp.clip(posterior[..., self.dim_z:], self.min_sigma, 10.0)
        return mu, logvar

    def __call__(self, o: jax.Array, eps: jax.Array,
                 c: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        x = self.ln(eps)
        return self.att1(o, x, c, deterministic=deterministic)


class Compressor(nn.Module):
    """The full set-VAE (Network.py:105-286), channels-last.

    cfg must expose the reference's `model:` config section attributes
    (experiments/Compressor_Trainer/airplane/config.yaml:44-67).
    """

    cfg: Any
    dtype: Dtype = jnp.float32
    # Pallas attention core for the set-transformer blocks, incl. the
    # 2048-query x 32-key decode cross-attention (Network.py:80-83);
    # differentiable (custom VJP), so valid for training too.
    fused_attention: bool = False
    # reference head-merge compat for imported torch checkpoints
    # (ldt_tpu/tools/port.py; see nn/layers.py::Attention.ref_merge)
    ref_merge: bool = False

    def setup(self):
        cfg = self.cfg
        self.input_dense = Dense(cfg.hidden_dim, dtype=self.dtype)
        if cfg.ActNorm is not None and cfg.ActNorm is not False:
            # The reference passes cfg.ActNorm straight through as
            # `feature_type` and only the literal string 'set' selects
            # batch*token-pooled stats (model/layers.py:86-101); the shipped
            # configs set `ActNorm: True` (a bool), which therefore lands on
            # the OTHER branch: PER-TOKEN stats with [1, z_scales, hidden]
            # shift/log_scale. Mirror that dispatch exactly.
            ft = cfg.ActNorm if cfg.ActNorm == "set" else "token"
            self.conv_in = ActNorm(cfg.hidden_dim, cfg.z_scales,
                                   feature_type=ft)
        self.group = LocalGrouper(cfg.hidden_dim, True,
                                  normalize=cfg.cluster_norm, dtype=self.dtype)
        if cfg.pre_group:
            self.pre_grouper = LocalGrouper(cfg.hidden_dim, True,
                                            normalize=cfg.cluster_norm,
                                            dtype=self.dtype)
        if cfg.pos_embedding == "mlp":
            self.pos_embedding = MLP(cfg.p_dim, cfg.p_dim, n_hidden=1,
                                     dtype=self.dtype)
        else:
            self.pos_embedding = MiniPointnet(cfg.p_dim, dtype=self.dtype)
        if cfg.class_condition:
            self.label_embedding = LabelEmbedding(cfg.num_categorys, cfg.p_dim,
                                                  cfg.p_dim, dtype=self.dtype)
            label_dim = cfg.p_dim
        else:
            label_dim = None
        self.label_dim = label_dim
        self.encoder = [
            Encoder(cfg.hidden_dim, cfg.p_dim, cfg.num_heads, norm=cfg.norm,
                    dropout_p=cfg.encoder_dropout_p,
                    num_layers=cfg.encoder_layers, mlp_ratio=cfg.mlp_ratio,
                    AdaLN=cfg.AdaLN, fused_attention=self.fused_attention,
                    ref_merge=self.ref_merge, dtype=self.dtype)
            for _ in range(cfg.n_layers)
        ]
        self.decoder = [
            DecoderBlock(cfg.hidden_dim, cfg.z_dim, cfg.num_heads,
                         norm=cfg.norm, dropout_p=cfg.decoder_dropout_p,
                         mlp_ratio=cfg.mlp_ratio, min_sigma=cfg.min_sigma,
                         act=cfg.decoder_act, c_dim=label_dim,
                         fused_attention=self.fused_attention,
                         ref_merge=self.ref_merge, dtype=self.dtype)
            for _ in range(cfg.n_layers)
        ]
        self.output_dense = Dense(3, dtype=self.dtype)
        self.init_set = InitialSet(cfg.hidden_dim, cfg.max_outputs)

    @staticmethod
    def norm_pts(pts):
        """Per-cloud standardization (Network.py:167-171)."""
        mean = jnp.mean(pts, axis=1, keepdims=True)
        std = jnp.std(pts, axis=1, keepdims=True, ddof=1)
        return (pts - mean) / std

    def bottom_up(self, pts: jax.Array, label: Optional[jax.Array] = None, *,
                  train: bool = False):
        """Encode [B, N, 3] -> per-stage taps (Network.py:188-206)."""
        cfg = self.cfg
        if cfg.norm_input:
            pts = self.norm_pts(pts)
        x = self.input_dense(pts)
        if cfg.pre_group:
            pts, x = self.pre_grouper(pts, x, 256, 32, train=train)
        n = pts.shape[1]
        center, x = self.group(pts, x, cfg.z_scales,
                               n // cfg.z_scales * 2, train=train)
        pos = self.pos_embedding(center, train=train) \
            if cfg.pos_embedding != "mlp" else self.pos_embedding(center)
        if label is not None:
            pos = pos + label
        if hasattr(self, "conv_in"):
            x = self.conv_in(x)
        outputs = []
        for layer in self.encoder:
            x, o = layer(x, pos, deterministic=not train)
            outputs.append(o)
        return {"outputs": outputs, "max": jnp.max(x)}

    def top_down(self, encoder_out: Sequence[jax.Array],
                 num_points: Optional[int] = None,
                 label: Optional[jax.Array] = None, *, train: bool = False):
        """Stochastic top-down decoding (Network.py:208-233)."""
        cfg = self.cfg
        b = encoder_out[0].shape[0]
        o = sp_shard(self.init_set(
            b, num_points if num_points is not None else cfg.outsize))
        posteriors, all_eps, kls, all_logqz, all_logpz = [(o, None, None)], [], [], [], []
        det = not train
        for idx in range(cfg.n_layers):
            layer = self.decoder[cfg.n_layers - 1 - idx]
            x = encoder_out[-idx - 1]
            mu, logvar = layer.compute_posterior(
                x, o if idx != 0 else None, c=label, deterministic=det)
            eps = reparameterize(self.make_rng("sample"), mu, logvar)
            logqz = log_p_var_normal(eps, mu, logvar)
            logpz = log_p_normal(eps)
            kls.append(logqz - logpz)
            o = sp_shard(layer(o, eps, label, deterministic=det))
            all_eps.append(eps)
            posteriors.append((eps, mu, logvar))
            all_logqz.append(logqz)
            all_logpz.append(logpz)
        o = self.output_dense(o)
        return {"set": o, "posteriors": posteriors, "kls": kls,
                "all_logqz": all_logqz, "all_eps": all_eps}

    def __call__(self, x: jax.Array, num_points: Optional[int] = None,
                 label: Optional[jax.Array] = None, *, train: bool = False):
        """Bidirectional inference (Network.py:235-249). x: [B, N, 3]."""
        if label is not None and self.cfg.class_condition:
            l_emb = self.label_embedding(label)
        else:
            l_emb = None
        bup = self.bottom_up(x, label=l_emb, train=train)
        tdn = self.top_down(bup["outputs"], num_points=num_points, label=l_emb,
                            train=train)
        # [B, z_scales, n_layers * z_dim]; decode-order layer i at [..., i*z_dim:(i+1)*z_dim]
        all_eps = jnp.concatenate(tdn["all_eps"], axis=-1)
        return {"set": self.postprocess(tdn["set"]),
                "posteriors": tdn["posteriors"], "kls": tdn["kls"],
                "all_eps": all_eps, "all_logqz": tdn["all_logqz"],
                "max": bup["max"]}

    def sample(self, shape, given_eps: Optional[jax.Array] = None):
        """Top-down generation from latents (Network.py:251-268).

        shape: (B, num_points); given_eps: [B, z_scales, n_layers * z_dim].
        """
        cfg = self.cfg
        b, num_points = shape[0], shape[1]
        o = sp_shard(self.init_set(
            b, num_points if num_points is not None else cfg.outsize))
        if given_eps is None:
            given_eps = jax.random.normal(
                self.make_rng("sample"),
                (b, cfg.z_scales, cfg.n_layers * cfg.z_dim), o.dtype)
        eps_list = jnp.split(given_eps, cfg.n_layers, axis=-1)
        for idx in range(cfg.n_layers):
            layer = self.decoder[cfg.n_layers - 1 - idx]
            o = sp_shard(layer(o, eps_list[idx]))
        o = self.output_dense(o)
        return self.postprocess(o)

    @staticmethod
    def postprocess(x: jax.Array) -> jax.Array:
        """Dataset-specific output squashing (Network.py:270-279)."""
        if x.shape[-1] == 2:
            return (jnp.tanh(x) + 1) / 2.0
        if x.shape[-1] == 3:
            return x
        if x.shape[-1] == 4:
            return x.at[..., -1].set((jnp.tanh(x[..., -1]) + 1) / 2.0)
        return x
