"""Grid R-CNN tests: grid targets/decode inverse property + detector."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.grid_rcnn import (
    expand_rois, grid_points_of, grid_targets, grid_decode)


def test_grid_targets_then_decode_recovers_box():
    rois = jnp.asarray([[0.0, 10.0, 10.0, 42.0, 42.0]])
    ex = expand_rois(rois)                 # 2x: [--6, -6, 58, 58]
    gt = jnp.asarray([[12.0, 14.0, 40.0, 38.0]])
    heat, inside = grid_targets(ex, gt, map_size=56, radius=0)
    assert bool(inside.all())
    dec = np.asarray(grid_decode(np.asarray(heat), ex))[0]
    np.testing.assert_allclose(dec, np.asarray(gt)[0], atol=1.5)


def test_grid_points_layout():
    p = np.asarray(grid_points_of(jnp.asarray([[0.0, 0.0, 2.0, 4.0]])))[0]
    np.testing.assert_allclose(p[0], [0, 0])
    np.testing.assert_allclose(p[4], [1, 2])   # center
    np.testing.assert_allclose(p[8], [2, 4])


def test_grid_rcnn_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "GridRCNN",
        "backbone": {"type": "ResNet", "depth": 18,
                     "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": 3, "grid_roi_size": 7,
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
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       mutable=["batch_stats"],
                       rngs={"sampler": jax.random.PRNGKey(2)})
    assert "loss_grid" in out
    assert all(np.isfinite(float(x)) for x in out.values())
    assert float(out["loss_grid"]) > 0
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
