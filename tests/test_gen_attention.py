"""GeneralizedAttention plugin (empirical attention,
reference `configs/empirical_attention/` + mmcv GeneralizedAttention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.gen_attention import (
    GeneralizedAttention)
from panoswintransformerobjectdetection_tpu.models.resnet import ResNet


@pytest.mark.parametrize("atype", ["1111", "0010", "1000", "0100", "0001"])
def test_shapes_and_terms(atype, rng):
    m = GeneralizedAttention(in_channels=16, num_heads=4, kv_stride=2,
                             attention_type=atype)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_zero_init_is_identity(rng):
    """proj_conv is zero-init, so the plugin is an exact no-op at init —
    attention-augmenting a pretrained backbone preserves its function."""
    m = GeneralizedAttention(in_channels=8, num_heads=2, kv_stride=2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(x),
                               atol=1e-6)


def test_grads_flow_through_all_terms(rng):
    m = GeneralizedAttention(in_channels=8, num_heads=2, kv_stride=1,
                             attention_type="1111")
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # un-zero the output projection so grads reach the attention terms
    params = dict(v["params"])
    params["proj_conv"] = {"kernel": jnp.asarray(
        rng.standard_normal(params["proj_conv"]["kernel"].shape)
        .astype(np.float32)),
        "bias": params["proj_conv"]["bias"]}

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    for name in ("query_conv", "key_conv", "value_conv", "pos_proj_y",
                 "pos_proj_x", "appr_bias", "geom_bias"):
        leaf = g[name]
        total = sum(float(jnp.abs(x_).sum())
                    for x_ in jax.tree_util.tree_leaves(leaf))
        assert total > 0, name


def test_resnet_stage_plugin(rng):
    bb = ResNet(depth=50, gen_attention={"num_heads": 8,
                                         "attention_type": "1111",
                                         "kv_stride": 2},
                stage_with_gen_attention=(False, False, True, True))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    v = bb.init(jax.random.PRNGKey(0), x)
    # plugin params exist exactly in stages 3 and 4
    assert "gen_attention" in v["params"]["layer3_0"]
    assert "gen_attention" in v["params"]["layer4_0"]
    assert "gen_attention" not in v["params"]["layer2_0"]
    outs = bb.apply(v, x)
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
