"""Latent DiT denoiser ("Score" net) + multimodal ConditionNet, TPU-native.

Re-design of reference `model/scorenet/score.py` (Negai-98/LDT) in
channels-last flax.linen. The denoiser operates on `[B, z_scale, z_dim]`
latents (= [B, 32, 120]): project to `hidden_size`, run `num_blocks` AdaLN
set-transformer blocks conditioned on the time (+ label / image) embedding,
cross-attending to the point-condition tokens on even blocks, then an AdaLN
final head back to `z_dim`. An optional UNet variant concatenates skip
features on the down path (score.py:66-83, 138-146).

ConditionNet (score.py:13-44) encodes a partial point cloud (conv ->
LocalGrouper(patch=z_scale) -> conv => `z_scale` condition tokens) and a view
image (truncated ResNet-18 trunk -> max-pool -> linear => a global embedding
added to the AdaLN conditioning vector).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ldt_tpu.nn.layers import (
    Dense,
    FinalLayer,
    LabelEmbedding,
    ResidualBlock,
    TimeEmbedding,
)
from ldt_tpu.models.compressor import LocalGrouper

Dtype = Any


class BasicBlock(nn.Module):
    """ResNet-18 basic block (torchvision semantics, channels-last)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        residual = x
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(h)
        if self.stride != 1 or residual.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return jax.nn.relu(h + residual)


class ResNet18Trunk(nn.Module):
    """First six children of torchvision resnet18: conv1/bn1/relu/maxpool/
    layer1/layer2 (the `[:-4]` slice at score.py:26). Output: [B, H/8, W/8, 128].
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):  # layer1: 64, stride 1
            h = BasicBlock(64, dtype=self.dtype, name=f"layer1_{i}")(h, train=train)
        h = BasicBlock(128, stride=2, dtype=self.dtype, name="layer2_0")(h, train=train)
        h = BasicBlock(128, dtype=self.dtype, name="layer2_1")(h, train=train)
        return h


class ConditionNet(nn.Module):
    """Partial-cloud + view-image condition encoder (score.py:13-44)."""

    hidden_size: int
    p_dim: int
    patch_size: int = 16
    img_condition: bool = True
    pt_condition: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, condition: dict, *, train: bool = False):
        pts_tokens, img_emb = None, None
        if self.img_condition and condition.get("img") is not None:
            img = condition["img"]  # [B, H, W, 3] channels-last
            h = ResNet18Trunk(dtype=self.dtype, name="resnet")(img, train=train)
            h = jnp.max(h, axis=(1, 2))  # adaptive_max_pool2d(·, 1)
            img_emb = Dense(self.p_dim, dtype=self.dtype, name="ln")(h)
        if self.pt_condition and condition.get("pts") is not None:
            pts = condition["pts"]  # [B, N, 3]
            x = Dense(128, dtype=self.dtype, name="pc_conv_in")(pts)
            # neighbor count: the reference's `x.shape[1] // patch_size * 2`
            # (score.py:41) reads the CHANNEL dim of the channels-first conv
            # output — i.e. a constant 128, giving k=8 at the shipped
            # patch_size=32 — not the point count. Probably a slip there,
            # but it defines the trained architecture; mirror it exactly.
            _, x = LocalGrouper(128, True, normalize="center",
                                dtype=self.dtype, name="group")(
                pts, x, self.patch_size,
                128 // self.patch_size * 2, train=train)
            pts_tokens = Dense(self.hidden_size, dtype=self.dtype,
                                  name="pc_conv_out")(x)
        return pts_tokens, (img_emb if img_emb is not None else 0.0)


class Score(nn.Module):
    """Latent DiT (score.py:47-151). cfg = the `score:` config section
    (experiments/Latent_Diffusion_Trainer/airplane/config.yaml:49-65)."""

    cfg: Any
    dtype: Dtype = jnp.float32
    fused_attention: bool = False  # Pallas attention core (sampling path)
    # reference head-merge compat for imported torch checkpoints
    # (ldt_tpu/tools/port.py; see nn/layers.py::Attention.ref_merge)
    ref_merge: bool = False

    def setup(self):
        cfg = self.cfg
        block = dict(dim_c=cfg.t_dim, num_heads=cfg.num_heads, norm=cfg.norm,
                     dropout_att=cfg.dropout, dropout_mlp=cfg.dropout,
                     act=cfg.act, AdaLN=cfg.AdaLN,
                     fused_attention=self.fused_attention,
                     ref_merge=self.ref_merge, dtype=self.dtype)
        if cfg.condition:
            self.c_net = ConditionNet(cfg.hidden_size, cfg.t_dim,
                                      patch_size=cfg.z_scale, dtype=self.dtype)
        if cfg.unet:
            self.transformer_up = [
                ResidualBlock(cfg.hidden_size, **block)
                for _ in range(cfg.num_blocks // 2)]
            self.transformer_mid = ResidualBlock(cfg.hidden_size, **block)
            self.transformer_down = [
                ResidualBlock(cfg.hidden_size * 2, dim_out=cfg.hidden_size,
                              **block)
                for _ in range(cfg.num_blocks // 2)]
        else:
            self.transformer = [
                ResidualBlock(cfg.hidden_size, **block)
                for _ in range(cfg.num_blocks)]
        if cfg.num_categorys > 1:
            self.label_embedding = LabelEmbedding(cfg.num_categorys, cfg.t_dim,
                                                  cfg.t_dim, dtype=self.dtype)
        self.ln_in = Dense(cfg.hidden_size, dtype=self.dtype)
        self.time_embedding = TimeEmbedding(cfg.t_dim // 4, cfg.t_dim,
                                            dtype=self.dtype)
        self.ln_out = FinalLayer(cfg.z_dim, dim_c=cfg.t_dim, norm=cfg.norm,
                                 dtype=self.dtype)

    def precompute_mods(self, t: jax.Array):
        """Precompute every AdaLN modulation for a vector of times `t` [S].

        The conditioning vector c = TimeEmbedding(t) depends on t alone (no
        label / image condition), so for a FIXED sampling schedule all S x
        num_blocks modulation vectors can be computed in ONE shot and the
        per-step TimeEmbedding + AdaLN matmuls hoisted out of the reverse-
        diffusion scan (~26 small matmuls per denoise step removed).

        Returns {'blocks': [S, num_blocks, 6*hidden], 'final': [S, 2*hidden]}.
        Only the non-UNet, unconditional path is supported (the flagship
        sampling config).
        """
        cfg = self.cfg
        assert not cfg.unet and cfg.AdaLN
        c = self.time_embedding(t)  # [S, t_dim]
        blocks = jnp.stack(
            [blk.compute_mods(c) for blk in self.transformer], axis=1)
        final = self.ln_out.compute_mods(c)
        return {"blocks": blocks, "final": final}

    def embed_times(self, t: jax.Array) -> jax.Array:
        """TimeEmbedding alone for a vector of times `t` [S] -> [S, t_dim].

        The conditional sampler cannot hoist full AdaLN modulations out of
        the reverse-diffusion scan (c = t_emb + img_emb is per-sample), but
        the sinusoidal+MLP time embedding depends on t alone, so it CAN be
        precomputed for the whole schedule (used by the int8 conditional
        serving path, ldt_tpu/serving/int8.py::denoise_cond_int8).
        """
        return self.time_embedding(t)

    def denoise_with_mods(self, x: jax.Array, mods) -> jax.Array:
        """Forward pass with precomputed per-block modulations for one step:
        mods = {'blocks': [num_blocks, 6*hidden], 'final': [2*hidden]}."""
        h = self.ln_in(x)
        for i, layer in enumerate(self.transformer):
            h = layer(h, None, None, mods=mods["blocks"][i])
        return self.ln_out(h, mods=mods["final"])

    def encode_condition(self, condition: dict, *, train: bool = False):
        """Pre-encode a {'img','pts'} condition once (the reference encodes
        once per sampling run, completion_trainer/Latent_SDE_Trainer.py:150-151,
        not once per denoise step)."""
        return self.c_net(condition, train=train)

    def __call__(self, x: jax.Array, t: jax.Array,
                 label: Optional[jax.Array] = None,
                 condition: Optional[Any] = None, *,
                 train: bool = False) -> jax.Array:
        """x: [B, z_scale, z_dim]; t: [B]; returns predicted noise, same shape.

        `condition` may be a dict {'img','pts'} (encoded via c_net) or a
        pre-encoded (tokens, embedding) pair (score.py:129-133).
        """
        cfg = self.cfg
        det = not train
        l_emb = self.label_embedding(label) if label is not None else None
        if condition is not None:
            if isinstance(condition, dict):
                condition = self.c_net(condition, train=train)
        else:
            condition = (None, 0.0)
        t_emb = self.time_embedding(t)
        c = t_emb + l_emb if l_emb is not None else t_emb + condition[1]
        h = self.ln_in(x)
        if cfg.unet:
            skips = [h]
            for layer in self.transformer_up:
                h = layer(h, condition[0], c, deterministic=det)
                skips.append(h)
            h = self.transformer_mid(h, condition[0], c, deterministic=det)
            for layer in self.transformer_down:
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = layer(h, condition[0], c, deterministic=det)
        else:
            for idx, layer in enumerate(self.transformer):
                h = layer(h, condition[0] if idx % 2 == 0 else None, c,
                          deterministic=det)
        return self.ln_out(h, c)
