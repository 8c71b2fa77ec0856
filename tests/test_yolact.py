"""YOLACT tests: crop op, train losses (incl. mask + segm), test masks."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.yolact import crop_mask


def test_crop_mask():
    m = jnp.ones((8, 8))
    out = np.asarray(crop_mask(m, jnp.asarray([8.0, 8.0, 24.0, 24.0]), 4.0))
    # pixels with centers in [8, 24] at stride 4: indices 2..5
    assert out[3, 3] == 1 and out[0, 0] == 0 and out[6, 6] == 0
    assert out.sum() == 16


def test_yolact_train_and_test(rng):
    det = build(DETECTORS, {
        "type": "YOLACT",
        "backbone": {"type": "ResNet", "depth": 18, "out_indices": (1, 2, 3)},
        "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                 "out_channels": 32, "num_outs": 5, "add_extra_convs": True,
                 "relu_before_extra_convs": True},
        "num_classes": 3, "mask_train_cap": 8,
    })
    B = 2
    imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
    v = det.init(jax.random.PRNGKey(0), imgs)
    shapes = jnp.full((B, 2), 64.0)
    gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                              (B, 1, 1)))
    gtm = np.zeros((B, 1, 64, 64), np.float32)
    gtm[:, 0, 8:36, 8:36] = 1.0
    out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                       jnp.ones((B, 1), bool), jnp.asarray(gtm),
                       method=det.forward_train, mutable=["batch_stats"])
    for k in ("loss_cls", "loss_bbox", "loss_mask", "loss_segm"):
        assert np.isfinite(float(out[k])), k
        assert float(out[k]) > 0, k
    grads = jax.grad(lambda p: sum(det.apply(
        {**v, "params": p}, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
        jnp.ones((B, 1), bool), jnp.asarray(gtm),
        method=det.forward_train, mutable=["batch_stats"])[0].values()))(
        v["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    dets, masks = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                            method=det.simple_test)
    assert dets.boxes.shape == (B, 100, 4)
    assert masks.shape[:2] == (B, 100) and masks.shape[2:] == (16, 16)
    assert ((np.asarray(masks) >= 0) & (np.asarray(masks) <= 1)).all()
