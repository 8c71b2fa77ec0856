"""Guided Anchoring tests: bounded IoU, guided anchors, train/test."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.guided_anchor import (
    bounded_iou_loss)


def test_bounded_iou_loss_zero_at_match():
    wh = jnp.asarray([[10.0, 20.0]])
    assert float(bounded_iou_loss(wh, wh)[0]) < 1e-6
    assert float(bounded_iou_loss(wh, jnp.asarray([[20.0, 20.0]]))[0]) > 0.1


def test_ga_retinanet_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "GARetinaNet",
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
    for k in ("loss_cls", "loss_bbox", "loss_shape", "loss_loc"):
        assert np.isfinite(float(out[k])), k
    assert float(out["loss_loc"]) > 0
    grads = jax.grad(lambda p: sum(det.apply(
        {**v, "params": p}, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
        jnp.ones((B, 1), bool), method=det.forward_train,
        mutable=["batch_stats"])[0].values()))(v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 100, 4)


def test_ga_faster_rcnn_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "GAFasterRCNN",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 32, "num_outs": 5},
        "num_classes": 3,
        "train_cfg": {
            "rpn_proposal": {"nms_pre": 200, "max_per_img": 64,
                             "iou_threshold": 0.7},
            "rcnn": {"num_samples": 32, "pos_fraction": 0.25,
                     "pos_iou_thr": 0.5, "neg_iou_thr": 0.5},
        },
        "test_cfg": {
            "rpn": {"nms_pre": 200, "max_per_img": 64, "iou_threshold": 0.7},
            "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5,
                     "max_per_img": 16},
        },
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 44, 44]]], np.float32),
                              (B, 1, 1)))
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), method=det.forward_train,
                       rngs={"sampler": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_rpn_shape",
              "loss_rpn_loc", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(out[k])), (k, out[k])
    grads = jax.grad(lambda p: sum(
        x for k, x in det.apply(
            {**v, "params": p}, imgs, shapes, gtb,
            jnp.zeros((B, 1), jnp.int32), jnp.ones((B, 1), bool),
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0].items() if "loss" in k))(v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test)
    assert res.boxes.shape == (B, 16, 4)


def test_ga_rpn_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "GARPN",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (0, 1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 32, "num_outs": 5},
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
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_rpn_shape",
              "loss_rpn_loc"):
        assert np.isfinite(float(out[k])), (k, out[k])
    res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                    method=det.simple_test, nms_pre=200, max_per_img=64)
    assert res.boxes.shape == (B, 64, 4)
    assert (np.asarray(res.labels)[np.asarray(res.mask)] == 0).all()
