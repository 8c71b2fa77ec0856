"""Pallas fused window attention vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.fused_attention import (
    fused_window_attention)
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
