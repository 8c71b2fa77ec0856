"""FoveaBox tests: fovea target regions + detector train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.fovea import (
    fovea_targets_level)


def test_fovea_targets_center_region():
    # gt sqrt(area)=28 -> level with bounds (8, 32); stride 8, base 16
    gts = jnp.asarray([[8.0, 8.0, 36.0, 36.0]])
    lab, tgt, pos = fovea_targets_level(
        gts, jnp.asarray([2]), jnp.asarray([True]), num_classes=5,
        H=8, W=8, stride=8, base_len=16, bound=(8, 32), sigma=0.4)
    lab = np.asarray(lab)
    # fovea of [1..4.5]/stride with sigma 0.4: pixels near the gt center
    assert (lab == 2).any() and (lab[(lab != 5)] == 2).all()
    cy, cx = np.argwhere(lab == 2).mean(0)
    assert abs(cx - 22.0 / 8) < 1.1 and abs(cy - 22.0 / 8) < 1.1
    # positive targets finite, log-space within [log(1/16), log(16)]
    t = np.asarray(tgt)[np.asarray(pos)]
    assert np.isfinite(t).all() and (np.abs(t) <= np.log(16) + 1e-6).all()


def test_fovea_smaller_gt_wins_overlap():
    gts = jnp.asarray([[0.0, 0.0, 40.0, 40.0], [12.0, 12.0, 28.0, 28.0]])
    lab, _, _ = fovea_targets_level(
        gts, jnp.asarray([1, 3]), jnp.asarray([True, True]), num_classes=5,
        H=8, W=8, stride=8, base_len=16, bound=(8, 64), sigma=1.0)
    lab = np.asarray(lab)
    # center pixel belongs to the smaller gt (label 3)
    assert lab[2, 2] == 3


def test_fovea_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "FOVEA",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True},
        "num_classes": 3,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(variables, imgs, shapes, gtb,
                       jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
                       method=det.forward_train, mutable=["batch_stats"])
    assert all(np.isfinite(float(x)) for x in out.values())
    assert float(out["loss_bbox"]) > 0  # the gt hits at least one level
    res = det.apply(variables, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)
