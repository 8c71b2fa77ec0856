"""Fused Pallas stem kernel vs the XLA conv chain (interpret mode).

Reference semantics: ConvStemPatchEmbed (models/layers.py), i.e. the
3-conv patch stem of `simple_panoswin_transformer.py:727-773` with BN
running-stats folded (inference path).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.stem_conv import (
    stem_conv_fused, fold_bn, TR)

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def xla_stem(x, w0, b0, w1, b1, wp, bp):
    def conv(h, k, stride, pad):
        return jax.lax.conv_general_dilated(
            h, k.astype(h.dtype), (stride, stride), pad,
            dimension_numbers=DN, preferred_element_type=jnp.float32)

    h = jnp.maximum(conv(x, w0, 1, "SAME") + b0, 0.0).astype(x.dtype)
    h = jnp.maximum(conv(h, w1, 1, "SAME") + b1, 0.0).astype(x.dtype)
    return (conv(h, wp, 4, "VALID") + bp).astype(x.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_stem_fused_matches_xla(dtype):
    rng = np.random.default_rng(0)
    B, H, W = 2, TR * 4, 256
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)) * 0.5, dtype)
    c0, c1, ce = 8, 16, 24
    w0 = jnp.asarray(rng.standard_normal((3, 3, 3, c0)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c0, c1)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((4, 4, c1, ce)) * 0.1, jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((c0,)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c1,)), jnp.float32)
    bp = jnp.asarray(rng.standard_normal((ce,)), jnp.float32)

    ref = xla_stem(x, w0, b0, w1, b1, wp, bp)
    got = stem_conv_fused(x, w0, b0, w1, b1, wp, bp, interpret=True)
    assert got.shape == (B, H // 4, W // 4, ce)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("fuse_bn", [False, True])
def test_patch_embed_fused_path_matches_xla(fuse_bn):
    """ConvStemPatchEmbed eval with the fused Pallas path forced ON
    (interpret mode) matches the stock XLA chain, BN folded or live."""
    from panoswintransformerobjectdetection_tpu.models import layers

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 3)), jnp.float32)
    mod = layers.ConvStemPatchEmbed(patch_size=4, embed_dim=24,
                                    fuse_bn=fuse_bn)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    if not fuse_bn:
        # exercise non-trivial running stats in the fold
        bs = jax.tree.map(lambda a: a, variables["batch_stats"])
        bs = {k: {"mean": jnp.asarray(rng.standard_normal(v["mean"].shape),
                                      jnp.float32),
                  "var": jnp.asarray(rng.uniform(0.5, 2.0, v["var"].shape),
                                     jnp.float32)}
              for k, v in bs.items()}
        variables = {"params": variables["params"], "batch_stats": bs}

    old = layers.USE_FUSED_STEM
    try:
        layers.USE_FUSED_STEM = False
        ref = mod.apply(variables, x, train=False)
        layers.USE_FUSED_STEM = True
        got = mod.apply(variables, x, train=False)
    finally:
        layers.USE_FUSED_STEM = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fold_bn_matches_batchnorm():
    rng = np.random.default_rng(1)
    k = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 8).astype(np.float32)
    beta = rng.standard_normal(8).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)

    kf, bf = fold_bn(k, gamma, beta, mean, var)
    y_fold = jax.lax.conv_general_dilated(
        x, jnp.asarray(kf), (1, 1), "SAME", dimension_numbers=DN) + bf
    y_raw = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), "SAME", dimension_numbers=DN)
    y_bn = (y_raw - mean) / np.sqrt(var + 1e-5) * gamma + beta
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_bn),
                               atol=1e-4)
