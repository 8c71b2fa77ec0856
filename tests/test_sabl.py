"""SABL tests: bucket encode/decode inverse + detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.sabl import (
    bucket_encode, bucket_decode)


def test_bucket_roundtrip(rng):
    anchors = jnp.asarray([[16.0, 16.0, 48.0, 48.0]] * 5)
    gts = jnp.asarray(rng.uniform(8, 56, (5, 4)).astype(np.float32))
    gts = jnp.stack([jnp.minimum(gts[:, 0], gts[:, 2]),
                     jnp.minimum(gts[:, 1], gts[:, 3]),
                     jnp.maximum(gts[:, 0], gts[:, 2]),
                     jnp.maximum(gts[:, 1], gts[:, 3])], -1)
    off, ow, lab, cw = bucket_encode(anchors, gts, 14, 3.0)
    # build perfect logits from the labels; decode gathers the offset at
    # the argmax bucket, so the full encode offsets round-trip directly
    logits = jax.nn.one_hot(lab, off.shape[-1]) * 10.0      # (N, 4, side)
    dec, conf = bucket_decode(anchors, logits, off, 14, 3.0)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-3)
    assert conf.shape == (5,)
    # top-1 weight is always 1 at the labeled bucket
    lab_w = jnp.take_along_axis(ow, lab[..., None], 2)[..., 0]
    np.testing.assert_array_equal(np.asarray(lab_w), 1.0)


def test_sabl_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "SABLRetinaNet",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 44, 44]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox_cls", "loss_bbox_reg"):
        assert np.isfinite(float(out[k])), k
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)


class TestSABLFasterRCNN:
    """Two-stage SABL (configs/sabl/sabl_faster_rcnn_*): bucketing coder
    on the RCNN head."""

    def _build(self):
        import jax
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.models.registry import (
            DETECTORS, build)
        det = build(DETECTORS, dict(
            type="SABLFasterRCNN",
            backbone=dict(type="ResNet", depth=50, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048),
                      out_channels=256, num_outs=5),
            num_classes=5))
        img = jnp.zeros((1, 64, 128, 3))
        shapes = jnp.array([[64.0, 128.0]])
        return det, img, shapes

    def test_train_and_test(self):
        import jax
        import jax.numpy as jnp
        det, img, shapes = self._build()
        gtb = jnp.array([[[4., 4., 40., 30.], [10., 8., 50., 28.]]])
        gtl = jnp.array([[1, 2]])
        gtv = jnp.array([[True, True]])
        vs = det.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)},
                      img, shapes, gtb, gtl, gtv, method=det.forward_train)
        out = det.apply(vs, img, shapes, gtb, gtl, gtv,
                        method=det.forward_train,
                        rngs={"sampler": jax.random.PRNGKey(2)})
        for k in ("loss_cls", "loss_bbox_cls", "loss_bbox_reg",
                  "loss_rpn_cls", "loss_rpn_bbox"):
            assert k in out and bool(jnp.isfinite(out[k]))
        res = det.apply(vs, img, shapes, method=det.simple_test)
        assert res.boxes.shape[-1] == 4


def test_sabl_cascade_rcnn_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "SABLCascadeRCNN",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 32, "num_outs": 5},
        "num_classes": 3,
        "train_cfg": {
            "rpn": {"num_samples": 32, "pos_fraction": 0.5},
            "rpn_proposal": {"nms_pre": 200, "max_per_img": 64,
                             "iou_threshold": 0.7},
            "rcnn": {"num_samples": 32, "pos_fraction": 0.25},
        },
        "test_cfg": {
            "rpn": {"nms_pre": 200, "max_per_img": 64, "iou_threshold": 0.7},
            "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5,
                     "max_per_img": 16},
        },
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init({"params": jax.random.PRNGKey(0),
                  "sampler": jax.random.PRNGKey(1)}, imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 44, 44]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       rngs={"sampler": jax.random.PRNGKey(2)},
                       mutable=["batch_stats"])
    for t in range(3):
        for k in ("loss_cls", "loss_bbox_cls", "loss_bbox_reg"):
            assert np.isfinite(float(out[f"s{t}.{k}"])), (t, k)
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 16, 4)
