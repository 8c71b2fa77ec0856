"""Cascade R-CNN multi-stage tests."""

import numpy as np
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build


def tiny_cascade():
    return build(DETECTORS, {
        "type": "CascadeRCNN",
        "backbone": {"type": "ResNet", "depth": 18},
        "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": 3,
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


class TestCascade:
    def test_train_losses_all_stages(self, rng):
        det = tiny_cascade()
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array(
            [[[4, 4, 30, 30], [20, 10, 50, 40]]], np.float32), (B, 1, 1)))
        gtl = jnp.zeros((B, 2), jnp.int32)
        gtv = jnp.ones((B, 2), bool)
        losses, _ = det.apply(variables, imgs, shapes, gtb, gtl, gtv,
                              method=det.forward_train,
                              rngs={"sampler": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
        for t in range(3):
            assert f"s{t}.loss_cls" in losses
            assert np.isfinite(float(losses[f"s{t}.loss_cls"]))
        assert "loss_rpn_cls" in losses

    def test_simple_test(self, rng):
        det = tiny_cascade()
        imgs = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        res = det.apply(variables, imgs, jnp.full((1, 2), 64.0),
                        jnp.ones((1, 4), jnp.float32), method=det.simple_test)
        assert res.boxes.shape == (1, 4, 4)
        assert np.isfinite(np.asarray(res.scores)[np.asarray(res.mask)]).all()

    def test_grads_flow_all_stages(self, rng):
        det = tiny_cascade()
        B = 1
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.array([[[4, 4, 30, 30]]], np.float32))
        gtl = jnp.zeros((B, 1), jnp.int32)
        gtv = jnp.ones((B, 1), bool)

        def loss_fn(params):
            out, _ = det.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, shapes, gtb, gtl, gtv, method=det.forward_train,
                rngs={"sampler": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return sum(v for k, v in out.items() if "loss" in k)

        g = jax.grad(loss_fn)(variables["params"])
        for t in range(3):
            gt = g[f"cascade_head_{t}"]
            total = sum(float(jnp.abs(l).sum())
                        for l in jax.tree_util.tree_leaves(gt))
            assert np.isfinite(total) and total > 0, f"stage {t}"

    def test_configured_bbox_head_and_giou(self, rng):
        """Per-stage head from config (`Shared4Conv1FCBBoxHead` as in the
        swin giou_4conv1f recipes) + giou reg loss train and test."""
        det = build(DETECTORS, {
            "type": "CascadeRCNN",
            "backbone": {"type": "ResNet", "depth": 18},
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 3,
            "bbox_head": {"type": "Shared4Conv1FCBBoxHead",
                          "norm_groups": 4, "conv_out_channels": 16},
            "train_cfg": {
                "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3,
                        "min_pos_iou": 0.3, "num_samples": 32,
                        "pos_fraction": 0.5},
                "rpn_proposal": {"nms_pre": 64, "max_per_img": 16,
                                 "iou_threshold": 0.7, "min_bbox_size": 0},
                "rcnn": {"num_samples": 16, "pos_fraction": 0.25,
                         "reg_loss": "giou", "reg_loss_weight": 10.0},
            },
            "test_cfg": {
                "rpn": {"nms_pre": 32, "max_per_img": 8,
                        "iou_threshold": 0.7, "min_bbox_size": 0},
                "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5,
                         "max_per_img": 4},
            },
        })
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        variables = det.init(jax.random.PRNGKey(0), imgs)
        # the configured head type is actually instantiated per stage
        assert "conv0" in variables["params"]["cascade_head_0"]
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array(
            [[[4, 4, 30, 30]]], np.float32), (B, 1, 1)))
        losses, _ = det.apply(variables, imgs, shapes, gtb,
                              jnp.zeros((B, 1), jnp.int32),
                              jnp.ones((B, 1), bool),
                              method=det.forward_train,
                              rngs={"sampler": jax.random.PRNGKey(1)},
                              mutable=["batch_stats"])
        for t in range(3):
            for k in ("loss_cls", "loss_bbox"):
                key = f"s{t}.{k}"
                assert any(key in x for x in losses), (key, list(losses))
        assert all(np.isfinite(float(v)) for v in losses.values())
        res = det.apply(variables, imgs, shapes,
                        jnp.ones((B, 4), jnp.float32),
                        method=det.simple_test)
        assert res.boxes.shape == (B, 4, 4)
