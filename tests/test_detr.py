"""DETR tests: sine encoding, Hungarian matcher, train/test paths."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.detr import (
    hungarian_match, sine_positional_encoding, boxes_cxcywh_to_xyxy)


def tiny_detr():
    return build(DETECTORS, {
        "type": "DETR",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (3,)},
        "num_classes": 3, "num_queries": 8, "dim": 32,
        "num_encoder_layers": 2, "num_decoder_layers": 2,
    })


class TestPieces:
    def test_hungarian_exact(self):
        cost = jnp.asarray(np.array([[[1.0, 100.0], [100.0, 1.0], [50.0, 50.0]]]))
        a = np.asarray(hungarian_match(cost))
        # rows 0,1 get the cheap diagonal; scipy assigns min(Q,G) rows
        assert a[0, 0] == 0 and a[0, 1] == 1
        assert (a[0] == -1).sum() == 1

    def test_sine_encoding_shape_and_variation(self):
        pe = sine_positional_encoding(4, 8, 32)
        assert pe.shape == (4, 8, 32)
        assert not np.allclose(pe[0, 0], pe[3, 7])
        assert np.abs(pe).max() <= 1.0 + 1e-6

    def test_box_conversion(self):
        b = jnp.array([[0.5, 0.5, 0.2, 0.4]])
        out = np.asarray(boxes_cxcywh_to_xyxy(b))[0]
        np.testing.assert_allclose(out, [0.4, 0.3, 0.6, 0.7], atol=1e-6)


class TestDETR:
    def test_train_and_aux_losses(self, rng):
        det = tiny_detr()
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array(
            [[[4, 4, 40, 40], [10, 30, 60, 62]]], np.float32), (B, 1, 1)))
        gtl = jnp.asarray(np.tile([[0, 2]], (B, 1)))
        gtv = jnp.ones((B, 2), bool)
        out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                           method=det.forward_train, mutable=["batch_stats"])
        assert "loss_cls" in out and "d0.loss_cls" in out
        for k, v in out.items():
            assert np.isfinite(float(v)), k

    def test_simple_test(self, rng):
        det = tiny_detr()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        res = det.apply(variables, imgs, jnp.full((1, 2), 64.0),
                        jnp.ones((1, 4), jnp.float32), method=det.simple_test)
        assert res.boxes.shape == (1, 24, 4)  # Q*C = 8*3 capped at 100
        b = np.asarray(res.boxes)
        assert np.isfinite(b).all()

    def test_grads(self, rng):
        det = tiny_detr()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)

        def loss_fn(p):
            out, _ = det.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                imgs, jnp.full((1, 2), 64.0),
                jnp.asarray([[[4, 4, 40, 40.]]]), jnp.zeros((1, 1), jnp.int32),
                jnp.ones((1, 1), bool), method=det.forward_train,
                mutable=["batch_stats"])
            return sum(v for v in out.values())

        g = jax.grad(loss_fn)(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))
        qg = float(jnp.abs(g["query_embed"]).sum())
        assert qg > 0
