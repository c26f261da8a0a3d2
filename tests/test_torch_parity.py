"""Differential parity vs the ACTUAL reference torch blocks (CPU).

The reference's `model/layers.py` imports with only torch+numpy, so the core
set-transformer blocks can be run directly: initialize the torch module,
port its weights into the flax twin, and require outputs equal to ~1e-4.
This is the strongest behavioral-parity evidence available without the
reference's CUDA extensions (which its model/Compressor/score modules need).

Skipped automatically when torch or /root/reference is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference tree unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.append(REF)

rl = pytest.importorskip("model.layers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ldt_tpu.nn.layers import (  # noqa: E402
    ActNorm,
    FinalLayer,
    ResidualBlock,
    TimeEmbedding,
)


def t2n(t):
    return t.detach().numpy()


def conv_kernel(conv):
    """torch Conv1d(k=1) weight [out,in,1] -> flax Dense kernel [in,out]."""
    return t2n(conv.weight)[:, :, 0].T


def linear_kernel(lin):
    return t2n(lin.weight).T


class TestResidualBlockParity:
    DIM, DC, H, N, B = 32, 16, 4, 5, 2

    def build_pair(self, seed=0):
        torch.manual_seed(seed)
        ref = rl.ResidualBlock(self.DIM, self.DIM, self.DC, self.H,
                               norm="layer_norm").eval()
        mine = ResidualBlock(self.DIM, dim_c=self.DC, num_heads=self.H,
                             norm="layer_norm")
        params = {
            "attn": {
                "fc_q": {"kernel": conv_kernel(ref.fc_q),
                         "bias": t2n(ref.fc_q.bias)},
                "fc_kv": {"kernel": conv_kernel(ref.fc_kv),
                          "bias": t2n(ref.fc_kv.bias)},
                "fc_o": {"kernel": conv_kernel(ref.fc_o),
                         "bias": t2n(ref.fc_o.bias)},
            },
            "adaLN": {"kernel": linear_kernel(ref.adaLN[1]),
                      "bias": t2n(ref.adaLN[1].bias)},
            "mlp": {
                "Dense_0": {"kernel": conv_kernel(ref.mlp.fc[0][0]),
                            "bias": t2n(ref.mlp.fc[0][0].bias)},
                "Dense_1": {"kernel": conv_kernel(ref.mlp.out),
                            "bias": t2n(ref.mlp.out.bias)},
            },
        }
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return ref, mine, {"params": params}

    @staticmethod
    def _patch_standard_merge(ref):
        """Replace the reference's attention with one whose HEAD MERGE is the
        standard transpose-then-reshape.

        DISCOVERED QUIRK (documented divergence, see README): the reference
        merges heads with `(w @ v).reshape(B, N, C)` on a [B, H, N, dh]
        tensor (model/layers.py:197) — no transpose — which is a fixed
        token/channel scramble, not the standard MHA concat. Our framework
        uses the standard merge (we never load reference checkpoints), so
        full-block parity is asserted against the merge-corrected reference.
        """

        def corrected(x, y):
            if y is None:
                y = x
            query = ref.fc_q(x)
            kv = ref.fc_kv(y)
            b, d, n = query.shape
            key, value = kv[:, :d, :], kv[:, d:, :]
            m = key.shape[2]
            h = ref.num_heads
            q = query.reshape(b, h, d // h, n).permute(0, 1, 3, 2)
            k = key.reshape(b, h, d // h, m).permute(0, 1, 3, 2)
            v = value.reshape(b, h, d // h, m).permute(0, 1, 3, 2)
            w = (q @ k.transpose(-2, -1)) * ((d // h) ** -0.5)
            w = w.softmax(dim=-1)
            att = (w @ v).permute(0, 2, 1, 3).reshape(b, n, d).transpose(1, 2)
            return ref.fc_o(att)

        ref.compute_attention = corrected
        return ref

    def test_reference_merge_quirk_is_exactly_understood(self):
        """Reproduce the reference's scrambled head merge to float precision
        (proves the divergence is a measured decision, not a porting slip)."""
        ref, _, _ = self.build_pair()
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.N, self.DIM).astype(np.float32)
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        with torch.no_grad():
            want = ref.compute_attention(xt, xt).numpy()
        h, dim = self.H, self.DIM
        dh = dim // h
        q = conv_kernel(ref.fc_q).T @ x.transpose(0, 2, 1) \
            + t2n(ref.fc_q.bias)[None, :, None]
        kv = conv_kernel(ref.fc_kv).T @ x.transpose(0, 2, 1) \
            + t2n(ref.fc_kv.bias)[None, :, None]
        k, v = kv[:, :dim], kv[:, dim:]
        qh = q.reshape(self.B, h, dh, self.N).transpose(0, 1, 3, 2)
        kh = k.reshape(self.B, h, dh, self.N).transpose(0, 1, 3, 2)
        vh = v.reshape(self.B, h, dh, self.N).transpose(0, 1, 3, 2)
        w = np.einsum("bhnd,bhmd->bhnm", qh, kh) * dh ** -0.5
        w = np.exp(w - w.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        o = np.einsum("bhnm,bhmd->bhnd", w, vh)
        # the quirk: reshape WITHOUT transposing (h, n) first
        o = o.reshape(self.B, self.N, dim).transpose(0, 2, 1)
        got = conv_kernel(ref.fc_o).T @ o + t2n(ref.fc_o.bias)[None, :, None]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_self_attention_forward_modulo_merge(self):
        ref, mine, variables = self.build_pair()
        self._patch_standard_merge(ref)
        rng = np.random.RandomState(0)
        x = rng.randn(self.B, self.N, self.DIM).astype(np.float32)
        c = rng.randn(self.B, self.DC).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(c)).numpy().transpose(0, 2, 1)
        got = np.asarray(mine.apply(variables, jnp.asarray(x),
                                    jnp.asarray(x), jnp.asarray(c)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_cross_attention_forward_modulo_merge(self):
        ref, mine, variables = self.build_pair(seed=1)
        self._patch_standard_merge(ref)
        rng = np.random.RandomState(1)
        x = rng.randn(self.B, self.N, self.DIM).astype(np.float32)
        y = rng.randn(self.B, 3, self.DIM).astype(np.float32)
        c = rng.randn(self.B, self.DC).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(y.transpose(0, 2, 1)),
                       torch.from_numpy(c)).numpy().transpose(0, 2, 1)
        got = np.asarray(mine.apply(variables, jnp.asarray(x),
                                    jnp.asarray(y), jnp.asarray(c)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_mods_fast_path_matches_torch(self):
        """The precomputed-modulation path must equal the torch forward too."""
        ref, mine, variables = self.build_pair(seed=2)
        self._patch_standard_merge(ref)
        rng = np.random.RandomState(2)
        x = rng.randn(self.B, self.N, self.DIM).astype(np.float32)
        c = rng.randn(1, self.DC).astype(np.float32)
        cb = np.broadcast_to(c, (self.B, self.DC)).copy()
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(cb)).numpy().transpose(0, 2, 1)
        mods = mine.apply(variables, jnp.asarray(c),
                          method=ResidualBlock.compute_mods)
        got = np.asarray(mine.apply(variables, jnp.asarray(x),
                                    jnp.asarray(x), mods=mods[0]))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestTimeEmbeddingParity:
    def test_forward(self):
        torch.manual_seed(0)
        ref = rl.TimeEmbedding(8, 16).eval()
        mine = TimeEmbedding(8, 16)
        params = jax.tree_util.tree_map(jnp.asarray, {
            "Dense_0": {"kernel": linear_kernel(ref.mlp[0]),
                        "bias": t2n(ref.mlp[0].bias)},
            "Dense_1": {"kernel": linear_kernel(ref.mlp[2]),
                        "bias": t2n(ref.mlp[2].bias)},
        })
        t = np.linspace(0.01, 1.0, 7).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(t)).numpy()
        got = np.asarray(mine.apply({"params": params}, jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestFinalLayerParity:
    def test_forward(self):
        torch.manual_seed(0)
        ref = rl.FinalLayer(32, 3, 16, "layer_norm").eval()
        mine = FinalLayer(3, dim_c=16, norm="layer_norm")
        params = jax.tree_util.tree_map(jnp.asarray, {
            "adaLN": {"kernel": linear_kernel(ref.adaLN[1]),
                      "bias": t2n(ref.adaLN[1].bias)},
            "ln": {"kernel": conv_kernel(ref.ln), "bias": t2n(ref.ln.bias)},
        })
        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 32).astype(np.float32)
        c = rng.randn(2, 16).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.from_numpy(x.transpose(0, 2, 1)),
                       torch.from_numpy(c)).numpy().transpose(0, 2, 1)
        got = np.asarray(mine.apply({"params": params}, jnp.asarray(x),
                                    jnp.asarray(c)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestActNormParity:
    def test_forward_given_params(self):
        torch.manual_seed(0)
        ref = rl.ActNorm(6, 4, feature_type="set").eval()
        with torch.no_grad():
            ref.shift.copy_(torch.randn(1, 1, 6))
            ref.log_scale.copy_(torch.randn(1, 1, 6) * 0.1)
            ref.initialized += 1
        mine = ActNorm(6)
        params = {"shift": jnp.asarray(t2n(ref.shift)),
                  "log_scale": jnp.asarray(t2n(ref.log_scale))}
        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 6).astype(np.float32)
        with torch.no_grad():
            # reference forward takes channels-first [B, C, N]
            want = ref(torch.from_numpy(x.transpose(0, 2, 1))
                       ).numpy().transpose(0, 2, 1)
        got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
