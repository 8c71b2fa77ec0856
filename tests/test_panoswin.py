"""PanoSwin backbone tests: shapes, modes, gradients, window machinery.

Mirrors the reference's inline `_test()` seeds
(`simple_panoswin_transformer.py:1240` shape sweep,
`:1276` WindowTransition involution).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.ops.windows import (
    window_partition, window_reverse, make_relative_position_index,
    swin_attention_mask, window_transition, window_transition_reverse,
)
from panoswintransformerobjectdetection_tpu.models.panoswin import PanoSwinTransformer


class TestWindowOps:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.random((2, 14, 28, 5)).astype(np.float32))
        w = window_partition(x, 7)
        assert w.shape == (2 * 2 * 4, 7, 7, 5)
        back = window_reverse(w, 7, 14, 28)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index_golden(self):
        # golden from the reference docstring demo (make_relative_position_index(3))
        idx = make_relative_position_index(3)
        expect_row0 = [12, 11, 10, 7, 6, 5, 2, 1, 0]
        assert idx.shape == (9, 9)
        assert idx.tolist()[0] == expect_row0
        assert idx.max() == 24 and idx.min() == 0

    def test_attention_mask_shape(self):
        m = swin_attention_mask(14, 14, 7, 3)
        assert m.shape == (4, 49, 49)
        assert set(np.unique(m)).issubset({0.0, -100.0})

    @pytest.mark.parametrize("h", [6, 7, 12, 15, 32])
    def test_transition_involution(self, rng, h):
        # h x (2h-1) maps: odd width exercises the ew2ns pad path
        w = 2 * h - 1
        x = jnp.asarray(np.arange(1 * h * w * 1, dtype=np.float32).reshape(1, h, w, 1))
        y = window_transition(x, 3, True)
        back = window_transition_reverse(y, 3, True, width_was_odd=bool(w % 2))
        np.testing.assert_array_equal(np.asarray(back)[:, :h, :w], np.asarray(x))

    def test_transition_planar_is_roll(self, rng):
        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        y = window_transition(x, 2, False)
        np.testing.assert_array_equal(
            np.asarray(y), np.roll(np.asarray(x), (-2, -2), axis=(1, 2)))


def tiny_backbone(**kw):
    cfg = dict(patch_size=4, in_chans=3, embed_dim=6, depths=(2, 2), num_heads=(1, 2),
               window_size=4, ape=True, out_indices=(0, 1), drop_path_rate=0.1)
    cfg.update(kw)
    return PanoSwinTransformer(**cfg)


class TestPanoSwinBackbone:
    @pytest.mark.parametrize("hw", [(32, 64), (30, 60)])
    def test_forward_shapes_pano(self, rng, hw):
        h, w = hw
        m = tiny_backbone(pano_mode=True)
        x = jnp.asarray(rng.random((2, h, w, 3)).astype(np.float32))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vars_, x)
        assert len(outs) == 2
        H0, W0 = -(-h // 4), -(-w // 4)
        assert outs[0].shape == (2, H0, W0, 6)
        assert outs[1].shape == (2, -(-H0 // 2), -(-W0 // 2), 12)

    def test_forward_planar_mode(self, rng):
        m = tiny_backbone(pano_mode=False)
        x = jnp.asarray(rng.random((1, 45, 41, 3)).astype(np.float32))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vars_, x)
        assert outs[0].shape[1:3] == (12, 11)

    def test_pitch_attention_odd_depth(self, rng):
        m = tiny_backbone(depths=(3, 2), pano_mode=True)
        x = jnp.asarray(rng.random((1, 32, 64, 3)).astype(np.float32))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(vars_, x)
        assert outs[0].shape == (1, 8, 16, 6)

    def test_grad_flows(self, rng):
        m = tiny_backbone()
        x = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))
        vars_ = m.init(jax.random.PRNGKey(0), x)

        def loss(p):
            outs = m.apply({"params": p, **{k: v for k, v in vars_.items() if k != "params"}}, x)
            return sum(jnp.sum(o) for o in outs)

        g = jax.grad(loss)(vars_["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # alpha table only matters in pano mode; check it receives gradient
        ga = g["layers_0"]["blocks_0"]["attn"]["alpha_table"]
        assert float(jnp.abs(ga).sum()) > 0

    def test_remat_matches(self, rng):
        x = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))
        m1 = tiny_backbone(use_checkpoint=False)
        m2 = tiny_backbone(use_checkpoint=True)
        v = m1.init(jax.random.PRNGKey(0), x)
        o1 = m1.apply(v, x)
        o2 = m2.apply(v, x)
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_planar_vs_pano_differ(self, rng):
        x = jnp.asarray(rng.random((1, 16, 32, 3)).astype(np.float32))
        m = tiny_backbone()
        v = m.init(jax.random.PRNGKey(0), x)
        o_pano = m.apply(v, x, pano_mode=True)
        o_plan = m.apply(v, x, pano_mode=False)
        assert not np.allclose(np.asarray(o_pano[0]), np.asarray(o_plan[0]))
