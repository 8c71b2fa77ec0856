"""SCNet tests: global context + relayed single mask branch."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def test_scnet_train_and_test_masks(rng):
    det = build(DETECTORS, {
        "type": "SCNet",
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
    for k in ("loss_glbctx", "loss_mask", "s0.loss_cls", "s2.loss_cls"):
        assert k in out, k
    assert all(np.isfinite(float(x)) for x in out.values())
    dets, probs = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                            method=det.simple_test_masks)
    assert dets.boxes.shape[0] == B
    assert probs.shape[2:] == (14, 14)
