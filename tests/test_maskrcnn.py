"""Mask R-CNN + ResNet backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.resnet import ResNet
from panoswintransformerobjectdetection_tpu.models.mask_head import paste_masks


def tiny_mask_rcnn():
    return build(DETECTORS, {
        "type": "MaskRCNN",
        "backbone": {"type": "ResNet", "depth": 18},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": 3,
        "mask_roi_size": 6,
        "train_cfg": {
            "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                    "num_samples": 32, "pos_fraction": 0.5},
            "rpn_proposal": {"nms_pre": 64, "max_per_img": 16,
                             "iou_threshold": 0.7, "min_bbox_size": 0},
            "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
                     "num_samples": 16, "pos_fraction": 0.25},
        },
        "test_cfg": {
            "rpn": {"nms_pre": 32, "max_per_img": 8, "iou_threshold": 0.7,
                    "min_bbox_size": 0},
            "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5, "max_per_img": 4},
        },
    })


class TestResNet:
    def test_forward_shapes(self, rng):
        m = ResNet(depth=18)
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]

    def test_resnet50_channels(self, rng):
        m = ResNet(depth=50)
        x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


class TestMaskRCNN:
    def test_train_with_masks(self, rng):
        det = tiny_mask_rcnn()
        B, H, W, G = 2, 64, 64, 3
        imgs = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array(
            [[[4, 4, 30, 30], [20, 10, 50, 40], [0, 0, 0, 0]]], np.float32),
            (B, 1, 1)))
        gtl = jnp.zeros((B, G), jnp.int32)
        gtv = jnp.asarray(np.tile([[True, True, False]], (B, 1)))
        masks = np.zeros((B, G, H, W), np.float32)
        masks[:, 0, 4:30, 4:30] = 1
        masks[:, 1, 10:40, 20:50] = 1
        losses, _ = det.apply(
            variables, imgs, shapes, gtb, gtl, gtv, jnp.asarray(masks),
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        assert "loss_mask" in losses
        assert np.isfinite(float(losses["loss_mask"]))

    def test_simple_test_masks(self, rng):
        det = tiny_mask_rcnn()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((1, 2), 64.0)
        sf = jnp.ones((1, 4), jnp.float32)
        dets, probs = det.apply(variables, imgs, shapes, sf,
                                method=det.simple_test_masks)
        assert probs.shape == (1, 4, 12, 12)
        assert np.isfinite(np.asarray(probs)).all()


class TestPasteMasks:
    def test_paste_location(self):
        probs = jnp.ones((1, 4, 4))
        boxes = jnp.array([[8.0, 8.0, 16.0, 16.0]])
        out = np.asarray(paste_masks(probs, boxes, 32, 32))
        assert out[0, 10, 10]
        assert not out[0, 2, 2]
        assert not out[0, 20, 25]


class TestMaskScoringRCNN:
    def test_train_has_mask_iou_loss_and_test_rescoring(self, rng):
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        det = build(DETECTORS, {
            "type": "MaskScoringRCNN",
            "backbone": {"type": "ResNet", "depth": 18,
                         "out_indices": (0, 1, 2, 3)},
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 3, "mask_roi_size": 7,
            "train_cfg": {
                "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3,
                        "min_pos_iou": 0.3, "num_samples": 64,
                        "pos_fraction": 0.5},
                "rpn_proposal": {"nms_pre": 128, "max_per_img": 64,
                                 "iou_threshold": 0.7, "min_bbox_size": 0},
                "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5,
                         "min_pos_iou": 0.5, "num_samples": 32,
                         "pos_fraction": 0.25}}})
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        v = det.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                                  (B, 1, 1)))
        gtm = np.zeros((B, 1, 64, 64), np.float32)
        gtm[:, 0, 8:36, 8:36] = 1.0
        out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                           jnp.ones((B, 1), bool), jnp.asarray(gtm),
                           method=det.forward_train, mutable=["batch_stats"],
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert "loss_mask_iou" in out and "loss_mask" in out
        assert all(np.isfinite(float(x)) for x in out.values())
        dets, probs = det.apply(v, imgs, shapes,
                                jnp.ones((B, 4), jnp.float32),
                                method=det.simple_test_masks)
        assert dets.boxes.shape[0] == B and probs.shape[:2] == dets.boxes.shape[:2]
