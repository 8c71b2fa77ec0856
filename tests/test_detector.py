"""End-to-end detector tests: tiny PanoFasterRCNN train/test forward.

Analogue of the reference's primary integration test
(`tests/test_models/test_forward.py`): build from config, run
forward_train on random images + random GT, run simple_test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
from panoswintransformerobjectdetection_tpu.models.fpn import FPN, nearest_upsample


def tiny_detector(num_classes=5, pano=True):
    return build(DETECTORS, {
        "type": "PanoFasterRCNN",
        "backbone": {"type": "PanoSwinTransformer", "embed_dim": 6,
                     "depths": (1, 1, 1, 1), "num_heads": (1, 1, 1, 2),
                     "window_size": 4, "ape": True, "pano_mode": pano,
                     "drop_path_rate": 0.0},
        "neck": {"type": "FPN", "in_channels": (6, 12, 24, 48),
                 "out_channels": 16, "num_outs": 5},
        "num_classes": num_classes,
        "train_cfg": {
            "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                    "num_samples": 64, "pos_fraction": 0.5},
            "rpn_proposal": {"nms_pre": 100, "max_per_img": 32,
                             "iou_threshold": 0.7, "min_bbox_size": 0},
            "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
                     "num_samples": 32, "pos_fraction": 0.25},
        },
        "test_cfg": {
            "rpn": {"nms_pre": 50, "max_per_img": 16, "iou_threshold": 0.7,
                    "min_bbox_size": 0},
            "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5, "max_per_img": 8},
        },
    })


@pytest.fixture(scope="module")
def det_and_vars():
    det = tiny_detector()
    imgs = jnp.zeros((2, 64, 128, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    return det, variables


def _random_gt(rng, B, G, h, w, num_classes):
    boxes = rng.random((B, G, 4)).astype(np.float32)
    boxes = np.stack([boxes[..., 0] * w * 0.5, boxes[..., 1] * h * 0.5,
                      boxes[..., 0] * w * 0.5 + 5 + boxes[..., 2] * w * 0.3,
                      boxes[..., 1] * h * 0.5 + 5 + boxes[..., 3] * h * 0.3], -1)
    labels = rng.integers(0, num_classes, (B, G))
    valid = np.ones((B, G), bool)
    valid[:, -1] = False  # exercise gt padding
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


class TestDetector:
    def test_init_param_tree(self, det_and_vars):
        det, variables = det_and_vars
        assert "params" in variables and "batch_stats" in variables
        p = variables["params"]
        assert "backbone_m" in p and "neck_m" in p and "rpn_m" in p and "bbox_head_m" in p

    def test_forward_train_losses(self, det_and_vars, rng):
        det, variables = det_and_vars
        imgs = jnp.asarray(rng.random((2, 64, 128, 3)).astype(np.float32))
        shapes = jnp.array([[64, 128], [60, 120]], jnp.float32)
        gtb, gtl, gtv = _random_gt(rng, 2, 4, 64, 128, 5)
        losses, updates = det.apply(
            variables, imgs, shapes, gtb, gtl, gtv,
            method=det.forward_train,
            rngs={"sampler": jax.random.PRNGKey(1), "droppath": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        for k in ["loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox", "acc"]:
            assert k in losses, losses.keys()
            assert np.isfinite(float(losses[k])), (k, losses[k])
        assert float(losses["loss_cls"]) > 0

    def test_simple_test_shapes(self, det_and_vars, rng):
        det, variables = det_and_vars
        imgs = jnp.asarray(rng.random((2, 64, 128, 3)).astype(np.float32))
        shapes = jnp.array([[64, 128], [64, 128]], jnp.float32)
        sf = jnp.ones((2, 4), jnp.float32)
        res = det.apply(variables, imgs, shapes, sf, method=det.simple_test)
        assert res.boxes.shape == (2, 8, 4)
        assert res.scores.shape == (2, 8)
        assert res.labels.shape == (2, 8)
        m = np.asarray(res.mask)
        if m.any():
            b = np.asarray(res.boxes)[m]
            assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()

    def test_train_step_grads(self, det_and_vars, rng):
        det, variables = det_and_vars
        imgs = jnp.asarray(rng.random((2, 64, 128, 3)).astype(np.float32))
        shapes = jnp.array([[64, 128], [64, 128]], jnp.float32)
        gtb, gtl, gtv = _random_gt(rng, 2, 4, 64, 128, 5)

        def loss_fn(params):
            out, _ = det.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, shapes, gtb, gtl, gtv, method=det.forward_train,
                rngs={"sampler": jax.random.PRNGKey(3),
                      "droppath": jax.random.PRNGKey(4)},
                mutable=["batch_stats"])
            return sum(v for k, v in out.items() if "loss" in k)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


class TestFPN:
    def test_shapes(self, rng):
        fpn = FPN(in_channels=(8, 16, 32, 64), out_channels=24, num_outs=5)
        feats = tuple(
            jnp.asarray(rng.random((1, 32 // 2**i, 64 // 2**i, c)).astype(np.float32))
            for i, c in enumerate((8, 16, 32, 64)))
        vars_ = fpn.init(jax.random.PRNGKey(0), feats)
        outs = fpn.apply(vars_, feats)
        assert len(outs) == 5
        assert outs[0].shape == (1, 32, 64, 24)
        assert outs[4].shape == (1, 2, 4, 24)

    def test_nearest_matches_torch(self, rng):
        import torch
        import torch.nn.functional as F
        x = rng.random((1, 3, 5, 2)).astype(np.float32)   # b h w c
        ref = F.interpolate(torch.tensor(np.moveaxis(x, -1, 1)), size=(6, 10),
                            mode="nearest").numpy()
        ours = nearest_upsample(jnp.asarray(x), 6, 10)
        np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref)


class TestNASFPN:
    def test_shapes_and_stack(self, rng):
        import jax
        from panoswintransformerobjectdetection_tpu.models.fpn import NASFPN
        neck = NASFPN(in_channels=(8, 16, 32), out_channels=12, num_outs=5,
                      stack_times=2)
        feats = tuple(
            jnp.asarray(rng.random((2, 32 // s, 64 // s, c)).astype(np.float32))
            for s, c in [(1, 8), (2, 16), (4, 32)])
        v = neck.init(jax.random.PRNGKey(0), feats)
        outs = neck.apply(v, feats)
        assert len(outs) == 5
        for i, o in enumerate(outs):
            assert o.shape == (2, 32 // 2 ** i, 64 // 2 ** i, 12)
        assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def _tiny_backbone_cfg():
    return {"type": "ResNet", "depth": 18, "out_indices": (0, 1, 2, 3)}


class TestRPNDetector:
    def test_train_and_test(self, rng):
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        det = build(DETECTORS, {
            "type": "RPN", "backbone": _tiny_backbone_cfg(),
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5}})
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        v = det.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, imgs)
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                                  (B, 1, 1)))
        gtv = jnp.ones((B, 1), bool)
        out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                           gtv, method=det.forward_train,
                           mutable=["batch_stats"],
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert set(out) == {"loss_rpn_cls", "loss_rpn_bbox"}
        assert all(np.isfinite(float(x)) for x in out.values())
        res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                        method=det.simple_test)
        assert res.boxes.shape[0] == B and bool(res.mask.any())
        assert (np.asarray(res.labels)[np.asarray(res.mask)] == 0).all()


class TestFastRCNN:
    def test_train_and_test_with_given_proposals(self, rng):
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        det = build(DETECTORS, {
            "type": "FastRCNN", "backbone": _tiny_backbone_cfg(),
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 3})
        B, P = 2, 512
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        v = det.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, imgs)
        shapes = jnp.full((B, 2), 64.0)
        props = jnp.asarray(
            np.stack([np.stack([rng.uniform(0, 30, P), rng.uniform(0, 30, P),
                                rng.uniform(34, 64, P),
                                rng.uniform(34, 64, P)], -1)
                      for _ in range(B)]).astype(np.float32))
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                                  (B, 1, 1)))
        gtv = jnp.ones((B, 1), bool)
        out, _ = det.apply(v, imgs, shapes, gtb, jnp.zeros((B, 1), jnp.int32),
                           gtv, props, method=det.forward_train,
                           mutable=["batch_stats"],
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert "loss_cls" in out and "loss_bbox" in out
        assert all(np.isfinite(float(x)) for x in out.values())
        res = det.apply(v, imgs, shapes, props, method=det.simple_test)
        assert res.boxes.shape[0] == B


class TestDetectoRS:
    def test_rfp_train_and_test(self, rng):
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        det = build(DETECTORS, {
            "type": "DetectoRS", "backbone": _tiny_backbone_cfg(),
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 3, "rfp_steps": 2})
        B = 2
        imgs = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        v = det.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, imgs)
        # rfp feedback convs + fusion gate exist
        assert "rfp_conv1" in v["params"]["backbone_m"]
        assert "rfp_weight" in v["params"]
        shapes = jnp.full((B, 2), 64.0)
        gtb = jnp.asarray(np.tile(np.array([[[4, 4, 40, 40]]], np.float32),
                                  (B, 1, 1)))
        out, _ = det.apply(v, imgs, shapes, gtb,
                           jnp.zeros((B, 1), jnp.int32),
                           jnp.ones((B, 1), bool), method=det.forward_train,
                           mutable=["batch_stats"],
                           rngs={"sampler": jax.random.PRNGKey(2)})
        assert all(np.isfinite(float(x)) for x in out.values())
        res = det.apply(v, imgs, shapes, jnp.ones((B, 4), jnp.float32),
                        method=det.simple_test)
        assert res.boxes.shape == (B, 100, 4)


def test_reference_detector_zoo_complete():
    """Every detector exported by the reference's
    `mmdet/models/detectors/__init__.py` __all__ has a registered TPU
    counterpart (BaseDetector/SingleStageDetector are abstract bases; the
    KD detector maps to the LD-GFL student)."""
    from panoswintransformerobjectdetection_tpu.models import DETECTORS
    reference_all = [
        "ATSS", "RPN", "FastRCNN", "FasterRCNN", "MaskRCNN", "CascadeRCNN",
        "HybridTaskCascade", "RetinaNet", "FCOS", "GridRCNN",
        "MaskScoringRCNN", "RepPointsDetector", "FOVEA", "FSAF", "NASFCOS",
        "PointRend", "GFL", "CornerNet", "PAA", "YOLOV3", "YOLACT", "VFNet",
        "DETR", "TridentFasterRCNN", "SparseRCNN", "SCNet", "PanoFasterRCNN",
    ]
    missing = [n for n in reference_all if n not in DETECTORS]
    assert not missing, missing
    # KD single-stage detector -> the LD student; plus extras beyond __all__
    for extra in ("LDGFL", "SSD", "CentripetalNet", "FreeAnchorRetinaNet",
                  "GARetinaNet", "SABLRetinaNet", "DetectoRS"):
        assert extra in DETECTORS, extra
