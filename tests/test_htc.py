"""HTC tests: per-stage masks with info flow + semantic branch."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def tiny_htc(with_semantic=False):
    return build(DETECTORS, {
        "type": "HybridTaskCascade",
        "backbone": {"type": "ResNet", "depth": 18},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": 3,
        "mask_roi_size": 6,
        "with_semantic": with_semantic,
        "semantic_classes": 8,
        "train_cfg": {
            "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                    "num_samples": 32, "pos_fraction": 0.5},
            "rpn_proposal": {"nms_pre": 64, "max_per_img": 16,
                             "iou_threshold": 0.7, "min_bbox_size": 0},
            "rcnn": {"num_samples": 16, "pos_fraction": 0.25},
        },
        "test_cfg": {
            "rpn": {"nms_pre": 32, "max_per_img": 8, "iou_threshold": 0.7,
                    "min_bbox_size": 0},
            "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5, "max_per_img": 4},
        },
    })


def _inputs(rng, B=2, H=64, W=64, G=2):
    imgs = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    gtb = jnp.asarray(np.tile(np.array(
        [[[4, 4, 30, 30], [20, 10, 50, 40]]], np.float32), (B, 1, 1)))
    gtl = jnp.zeros((B, G), jnp.int32)
    gtv = jnp.ones((B, G), bool)
    masks = np.zeros((B, G, H, W), np.float32)
    masks[:, 0, 4:30, 4:30] = 1
    masks[:, 1, 10:40, 20:50] = 1
    return imgs, jnp.full((B, 2), float(H)), gtb, gtl, gtv, jnp.asarray(masks)


def test_htc_train_all_stage_masks(rng):
    det = tiny_htc()
    imgs, shapes, gtb, gtl, gtv, masks = _inputs(rng)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    losses, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv, masks,
                          method=det.forward_train,
                          rngs={"sampler": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])
    for t in range(3):
        assert f"s{t}.loss_mask" in losses
        assert np.isfinite(float(losses[f"s{t}.loss_mask"]))


def test_htc_semantic_branch(rng):
    det = tiny_htc(with_semantic=True)
    imgs, shapes, gtb, gtl, gtv, masks = _inputs(rng)
    sem = jnp.asarray((rng.random((2, 64, 64)) * 7).astype(np.int32))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    losses, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv, masks, sem,
                          method=det.forward_train,
                          rngs={"sampler": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])
    assert "loss_semantic" in losses
    assert np.isfinite(float(losses["loss_semantic"]))


def test_htc_test_masks(rng):
    det = tiny_htc()
    imgs, shapes, *_ = _inputs(rng, B=1)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    dets, probs = det.apply(variables, imgs, shapes,
                            jnp.ones((1, 4), jnp.float32),
                            method=det.simple_test_masks)
    assert probs.shape == (1, 4, 12, 12)
    assert np.isfinite(np.asarray(probs)).all()
