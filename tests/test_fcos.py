"""FCOS anchor-free detector tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.fcos import fcos_targets


def tiny_fcos():
    return build(DETECTORS, {
        "type": "FCOS",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3,
    })


class TestFCOSTargets:
    def test_point_inside_box_positive(self):
        points = jnp.array([[16.0, 16.0], [200.0, 200.0]])
        ranges = jnp.array([[-1.0, 64.0], [-1.0, 64.0]])
        gts = jnp.array([[0.0, 0.0, 32.0, 32.0]])
        labels, ltrb, ctr, pos = fcos_targets(
            points, ranges, gts, jnp.array([1]), jnp.array([True]), 3)
        assert bool(pos[0]) and not bool(pos[1])
        assert int(labels[0]) == 1 and int(labels[1]) == 3
        np.testing.assert_allclose(np.asarray(ltrb[0]), [16, 16, 16, 16], atol=1e-5)
        assert abs(float(ctr[0]) - 1.0) < 1e-5  # centered point

    def test_range_gating(self):
        # a big box whose max ltrb exceeds the level range -> negative
        points = jnp.array([[50.0, 50.0]])
        ranges = jnp.array([[-1.0, 64.0]])
        gts = jnp.array([[0.0, 0.0, 300.0, 300.0]])
        _, _, _, pos = fcos_targets(points, ranges, gts, jnp.array([0]),
                                    jnp.array([True]), 3)
        assert not bool(pos[0])

    def test_smallest_area_wins(self):
        points = jnp.array([[16.0, 16.0]])
        ranges = jnp.array([[-1.0, 64.0]])
        gts = jnp.array([[0.0, 0.0, 60.0, 60.0], [8.0, 8.0, 24.0, 24.0]])
        labels, _, _, _ = fcos_targets(points, ranges, gts, jnp.array([0, 2]),
                                       jnp.array([True, True]), 3)
        assert int(labels[0]) == 2


class TestFCOS:
    def test_train_and_test(self, rng):
        det = tiny_fcos()
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32), (B, 1, 1)))
        gtl = jnp.zeros((B, 1), jnp.int32)
        gtv = jnp.ones((B, 1), bool)
        out, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                           method=det.forward_train, mutable=["batch_stats"])
        for k in ("loss_cls", "loss_bbox", "loss_centerness"):
            assert np.isfinite(float(out[k])), k
        res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                        method=det.simple_test)
        assert res.boxes.shape == (B, 100, 4)

    def test_grads(self, rng):
        det = tiny_fcos()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)

        def loss_fn(p):
            out, _ = det.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                imgs, jnp.full((1, 2), 64.0),
                jnp.asarray([[[4, 4, 40, 40.]]]), jnp.zeros((1, 1), jnp.int32),
                jnp.ones((1, 1), bool), method=det.forward_train,
                mutable=["batch_stats"])
            return sum(v for k, v in out.items() if "loss" in k)

        g = jax.grad(loss_fn)(variables["params"])
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))


class TestFCOSVariants:
    """configs/fcos knobs: center sampling, norm_on_bbox, GIoU,
    centerness-on-cls-tower."""

    def test_center_sampling_restricts_positives(self):
        # points far from the gt center but inside the box become negative
        points = jnp.array([[16.0, 16.0], [60.0, 60.0]])
        ranges = jnp.array([[-1.0, 1e8], [-1.0, 1e8]])
        gts = jnp.array([[0.0, 0.0, 64.0, 64.0]])  # center (32, 32)
        strides = jnp.array([8.0, 8.0])
        _, _, _, pos = fcos_targets(points, ranges, gts, jnp.array([1]),
                                    jnp.array([True]), 3, strides=strides,
                                    center_sample_radius=1.5)
        # radius box is 32 +- 12: (16,16) outside, (60,60) outside too
        assert not bool(pos[0]) and not bool(pos[1])
        _, _, _, pos2 = fcos_targets(
            jnp.array([[30.0, 30.0]]), ranges[:1], gts, jnp.array([1]),
            jnp.array([True]), 3, strides=strides[:1],
            center_sample_radius=1.5)
        assert bool(pos2[0])

    def test_variant_detector_trains(self, rng):
        det = build(DETECTORS, {
            "type": "FCOS",
            "backbone": {"type": "ResNet", "depth": 18,
                         "out_indices": (1, 2, 3)},
            "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                     "out_channels": 32, "num_outs": 5,
                     "add_extra_convs": True,
                     "relu_before_extra_convs": True},
            "num_classes": 3,
            "center_sampling": True, "norm_on_bbox": True,
            "centerness_on_reg": True, "use_giou": True,
        })
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        v = det.init(jax.random.PRNGKey(0), imgs)
        out, _ = det.apply(v, imgs, jnp.full((1, 2), 64.0),
                           jnp.asarray([[[20, 20, 44, 44.]]]),
                           jnp.zeros((1, 1), jnp.int32),
                           jnp.ones((1, 1), bool),
                           method=det.forward_train,
                           mutable=["batch_stats"])
        for k in ("loss_cls", "loss_bbox", "loss_centerness"):
            assert np.isfinite(float(out[k])), (k, out[k])
        res = det.apply(v, imgs, jnp.full((1, 2), 64.0),
                        jnp.ones((1, 4), jnp.float32),
                        method=det.simple_test)
        assert res.boxes.shape[0] == 1
