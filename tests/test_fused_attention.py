"""Pallas fused window attention vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.fused_attention import (
    fused_window_attention, packed_window_attention, _packed_forward,
    _xla_reference)
from panoswintransformerobjectdetection_tpu.models.panoswin import _attention_core


class TestFusedAttention:
    def test_matches_xla_core(self, rng):
        B, nW, h, O, d = 2, 8, 3, 56, 32
        n = B * nW
        q = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(nW, h, O, O)).astype(np.float32))
        scale = d ** -0.5
        ref = _attention_core(q, k, v, bias, None, scale)
        out = fused_window_attention(q, k, v, bias, scale, wblk=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_padded_columns_ignored(self, rng):
        """Keys masked by -1e9 bias columns contribute nothing."""
        B, nW, h, O, d = 1, 2, 1, 16, 8
        n = B * nW
        q = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        bias = jnp.zeros((nW, h, O, O))
        bias = bias.at[..., :, 8:].set(-1e9)
        out = fused_window_attention(q, k, v, bias, 1.0, wblk=2, interpret=True)
        # altering masked-out keys/values must not change the result
        k2 = k.at[:, :, 8:].set(100.0)
        v2 = v.at[:, :, 8:].set(-55.0)
        out2 = fused_window_attention(q, k2, v2, bias, 1.0, wblk=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out[:, :, :8]),
                                   np.asarray(out2[:, :, :8]), atol=1e-5)


class TestPackedAttention:
    def _rand(self, rng, B, nW, h, O, d):
        n = B * nW
        q = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(n, h, O, d)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(nW, h, O, O)).astype(np.float32))
        return q, k, v, bias

    def test_matches_xla_core(self, rng):
        q, k, v, bias = self._rand(rng, 2, 8, 3, 56, 32)
        scale = 32 ** -0.5
        ref = _attention_core(q, k, v, bias, None, scale)
        out = _packed_forward(q, k, v, bias, scale, wpack=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_window_count_not_divisible_by_wpack(self, rng):
        """nW=5, wpack=4: pad windows must not leak into real outputs."""
        q, k, v, bias = self._rand(rng, 2, 5, 2, 8, 8)
        ref = _attention_core(q, k, v, bias, None, 1.0)
        out = _packed_forward(q, k, v, bias, 1.0, wpack=4, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_window_isolation(self, rng):
        """Packing must not let window A's keys influence window B: editing
        one window's k/v leaves every other window's output unchanged."""
        q, k, v, bias = self._rand(rng, 1, 4, 1, 8, 8)
        out = _packed_forward(q, k, v, bias, 1.0, wpack=4, interpret=True)
        k2 = k.at[2].set(9.0)
        v2 = v.at[2].set(-7.0)
        out2 = _packed_forward(q, k2, v2, bias, 1.0, wpack=4, interpret=True)
        keep = np.array([0, 1, 3])
        np.testing.assert_allclose(np.asarray(out[keep]),
                                   np.asarray(out2[keep]), atol=1e-5)
        assert not np.allclose(np.asarray(out[2]), np.asarray(out2[2]))

    def test_custom_vjp_matches_xla_grads(self, rng):
        q, k, v, bias = self._rand(rng, 1, 4, 2, 8, 8)
        scale = 8 ** -0.5

        def loss_packed(q, k, v, bias):
            return (packed_window_attention(q, k, v, bias, scale, 2) ** 2).sum()

        def loss_ref(q, k, v, bias):
            return (_xla_reference(q, k, v, bias, scale) ** 2).sum()

        g1 = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestFusedBackboneParity:
    """Model-level A/B: PanoSwinTransformer(fused_attention=True) must match
    the XLA path bit-for-bit-ish in both pano (sphere bias) and planar
    (shifted-window mask folded into the bias) modes, including the O->8k
    token-padding path (window_size=5 -> O=25 -> 32)."""

    def _run(self, rng, pano_mode, window_size, hw):
        from panoswintransformerobjectdetection_tpu.models.panoswin import (
            PanoSwinTransformer)
        cfg = dict(patch_size=4, in_chans=3, embed_dim=6, depths=(2, 2),
                   num_heads=(1, 2), window_size=window_size, ape=False,
                   out_indices=(0, 1), drop_path_rate=0.0,
                   pano_mode=pano_mode)
        m0 = PanoSwinTransformer(**cfg)
        m1 = PanoSwinTransformer(**cfg, fused_attention=True)
        x = jnp.asarray(rng.random((1, *hw, 3)).astype(np.float32))
        vars_ = m0.init(jax.random.PRNGKey(0), x)
        o0 = m0.apply(vars_, x)
        o1 = m1.apply(vars_, x)
        for a, b in zip(o0, o1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=1e-4)

    def test_pano_mode(self, rng):
        self._run(rng, True, 4, (32, 64))

    def test_planar_shifted_mask(self, rng):
        self._run(rng, False, 4, (32, 32))

    def test_token_padding_path(self, rng):
        self._run(rng, True, 5, (40, 80))
