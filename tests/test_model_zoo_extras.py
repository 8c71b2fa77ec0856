"""Round-2 model-zoo additions: PISA, GHM, CARAFE-FPN, BFP (Libra),
NeckChain, DeepFashion dataset, ghm_r loss.

Reference: configs/pisa, configs/ghm (`mmdet/models/losses/ghm_loss.py`),
configs/carafe (`mmdet/models/necks/fpn_carafe.py`), configs/libra_rcnn
(`mmdet/models/necks/bfp.py`).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from panoswintransformerobjectdetection_tpu.models import DETECTORS, NECKS, build
from panoswintransformerobjectdetection_tpu.core import losses


BB = {"type": "ResNet", "depth": 18}
NECK = {"type": "FPN", "in_channels": (64, 128, 256, 512),
        "out_channels": 16, "num_outs": 5}


def _train_batch(rng, B=2, H=64, W=128, G=3):
    r = np.random.default_rng(0)
    return dict(
        images=jnp.asarray(r.random((B, H, W, 3)), jnp.float32),
        img_shapes=jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1)),
        gt_boxes=jnp.asarray(r.uniform(0, 40, (B, G, 4)).cumsum(-1),
                             jnp.float32),
        gt_labels=jnp.zeros((B, G), jnp.int32),
        gt_valid=jnp.ones((B, G), bool),
    )


class TestPISA:
    def test_faster_rcnn_pisa_losses(self, rng):
        det = build(DETECTORS, {
            "type": "FasterRCNN", "backbone": BB, "neck": NECK,
            "num_classes": 5,
            "pisa": {"isr_k": 2.0, "isr_bias": 0.0, "carl_k": 1.0,
                     "carl_bias": 0.2},
            "train_cfg": {
                "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3,
                        "min_pos_iou": 0.3, "num_samples": 16,
                        "pos_fraction": 0.5},
                "rpn_proposal": {"nms_pre": 32, "max_per_img": 16,
                                 "iou_threshold": 0.7, "min_bbox_size": 0},
                "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5,
                         "min_pos_iou": 0.5, "num_samples": 16,
                         "pos_fraction": 0.25},
            },
        })
        b = _train_batch(rng)
        vs = det.init(jax.random.PRNGKey(0), b["images"])
        out = det.apply(vs, **b, method=det.forward_train,
                        rngs={"sampler": jax.random.PRNGKey(1)})
        assert "loss_carl" in out
        for k, v in out.items():
            assert np.isfinite(float(v)), (k, v)


class TestGHM:
    def test_ghm_r_matches_asl1_at_uniform_density(self):
        # single bin -> all weights equal -> GHMR == mean ASL1
        pred = jnp.asarray([[1.0, 2.0], [0.5, -1.0]])
        tgt = jnp.zeros((2, 2))
        mu = 0.02
        got = float(losses.ghm_r_loss(pred, tgt, mu=mu, bins=1))
        asl1 = np.sqrt(np.asarray(pred) ** 2 + mu ** 2) - mu
        assert abs(got - asl1.mean()) < 1e-5

    def test_ghm_c_downweights_dense_bins(self):
        # many easy negatives + one hard positive: the hard example's
        # effective weight must exceed an easy one's
        logits = jnp.asarray([[-5.0]] * 50 + [[-4.9]] * 49 + [[5.0]])
        labels = jnp.asarray([1] * 99 + [0])  # all bg(=1 of 1 class) but one
        lo = float(losses.ghm_c_loss(logits, labels, 1, bins=10))
        assert np.isfinite(lo) and lo >= 0

    def test_retinanet_ghm_config_trains(self, rng):
        det = build(DETECTORS, {
            "type": "RetinaNet",
            "backbone": {"type": "ResNet", "depth": 18,
                         "out_indices": (1, 2, 3)},
            "neck": {"type": "FPN", "in_channels": (128, 256, 512),
                     "out_channels": 16, "num_outs": 5,
                     "add_extra_convs": True},
            "num_classes": 5,
            "loss_cls": {"type": "GHMC", "bins": 30},
            "loss_bbox": {"type": "GHMR", "mu": 0.02, "bins": 10},
        })
        b = _train_batch(rng)
        vs = det.init(jax.random.PRNGKey(0), b["images"])
        out = det.apply(vs, **b, method=det.forward_train)
        assert all(np.isfinite(float(v)) for v in out.values()), out


class TestNecks:
    def _feats(self):
        r = np.random.default_rng(0)
        return tuple(jnp.asarray(r.random((2, s, 2 * s, c)), jnp.float32)
                     for s, c in ((16, 64), (8, 128), (4, 256), (2, 512)))

    def test_fpn_carafe_shapes(self):
        neck = build(NECKS, {"type": "FPN_CARAFE",
                             "in_channels": (64, 128, 256, 512),
                             "out_channels": 16, "num_outs": 5})
        feats = self._feats()
        vs = neck.init(jax.random.PRNGKey(0), feats)
        outs = neck.apply(vs, feats)
        assert len(outs) == 5
        assert outs[0].shape == (2, 16, 32, 16)
        assert outs[4].shape == (2, 1, 2, 16)

    def test_bfp_preserves_shapes_and_adds_residual(self):
        feats5 = tuple(jnp.asarray(
            np.random.default_rng(1).random((2, s, 2 * s, 16)), jnp.float32)
            for s in (16, 8, 4, 2, 1))
        neck = build(NECKS, {"type": "BFP", "in_channels": 16,
                             "num_levels": 5, "refine_level": 2})
        vs = neck.init(jax.random.PRNGKey(0), feats5)
        outs = neck.apply(vs, feats5)
        assert tuple(o.shape for o in outs) == tuple(f.shape for f in feats5)
        # not the identity: the refined residual must change the maps
        assert not np.allclose(np.asarray(outs[0]), np.asarray(feats5[0]))

    def test_libra_neck_chain_in_detector(self, rng):
        det = build(DETECTORS, {
            "type": "FasterRCNN", "backbone": BB,
            "neck": [dict(type="FPN", in_channels=(64, 128, 256, 512),
                          out_channels=16, num_outs=5),
                     dict(type="BFP", in_channels=16, num_levels=5,
                          refine_level=2)],
            "num_classes": 5,
        })
        b = _train_batch(rng)
        vs = det.init(jax.random.PRNGKey(0), b["images"])
        feats = det.apply(vs, b["images"], method=det.extract_feat)
        assert len(feats) == 5


class TestDeepFashion:
    def test_registered_with_15_classes(self):
        from panoswintransformerobjectdetection_tpu.data.datasets import (
            DeepFashionDataset)
        from panoswintransformerobjectdetection_tpu.data.builder import DATASETS
        assert DATASETS["DeepFashionDataset"] is DeepFashionDataset
        assert len(DeepFashionDataset.CLASSES) == 15


class TestRound2Detectors:
    TRAIN_CFG = {
        "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                "num_samples": 16, "pos_fraction": 0.5},
        "rpn_proposal": {"nms_pre": 32, "max_per_img": 16,
                         "iou_threshold": 0.7, "min_bbox_size": 0},
        "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
                 "num_samples": 16, "pos_fraction": 0.25},
    }

    def _run_train(self, extra):
        cfg = {"type": "FasterRCNN", "backbone": BB, "neck": NECK,
               "num_classes": 5, "train_cfg": self.TRAIN_CFG}
        cfg.update(extra)
        det = build(DETECTORS, cfg)
        b = _train_batch(None)
        vs = det.init(jax.random.PRNGKey(0), b["images"])
        out = det.apply(vs, **b, method=det.forward_train,
                        rngs={"sampler": jax.random.PRNGKey(1)})
        assert all(np.isfinite(float(v)) for v in out.values()), out
        return out

    def test_double_head_rcnn(self):
        self._run_train({"type": "DoubleHeadRCNN"})

    def test_dynamic_rcnn(self):
        self._run_train({"type": "DynamicRCNN", "dynamic_topk": 8})

    def test_groie_extractor(self):
        self._run_train({"roi_extractor": "generic"})

    def test_gn_head(self):
        self._run_train({"bbox_head": {"type": "Shared4Conv1FCBBoxHead",
                                       "conv_out_channels": 16,
                                       "fc_out_channels": 32,
                                       "norm_groups": 4}})

    def test_dcn_resnet_backbone(self):
        # deform conv in res3-res5 (configs/dcn) — forward shapes only
        # (the bilinear sampling path is grad-checked in its own tests)
        from panoswintransformerobjectdetection_tpu.models import BACKBONES
        bb = build(BACKBONES, dict(
            type="ResNet", depth=50, dcn=dict(type="DCNv2"),
            stage_with_dcn=(False, True, True, True),
            gcb=dict(ratio=0.25), stage_with_gcb=(False, True, True, True)))
        x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                        jnp.float32)
        vs = bb.init(jax.random.PRNGKey(0), x)
        outs = bb.apply(vs, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]
        # DCNv2 zero-init: offsets start at zero, so the deformable conv
        # must behave like a dense conv at init (finite, nonzero output)
        assert np.isfinite(np.asarray(outs[-1])).all()


class TestPhotoMetricDistortion:
    def test_jitters_in_range(self):
        from panoswintransformerobjectdetection_tpu.data.transforms import (
            PhotoMetricDistortion)
        import random as pyrandom
        pyrandom.seed(3)
        img = (np.random.default_rng(0).random((32, 64, 3)) * 255)
        out = PhotoMetricDistortion()({"img": img.copy()})["img"]
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255
        changed = any(
            not np.allclose(
                PhotoMetricDistortion()({"img": img.copy()})["img"], img)
            for _ in range(5))
        assert changed


class TestDeformRoIPool:
    def test_zero_offsets_match_roi_align(self, rng):
        """deform_roi_pool with zero offsets must equal standard RoIAlign
        (the mmcv DeformRoIPool init condition: zero-init offset fc)."""
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.roi_align import (
            multilevel_roi_align, deform_roi_pool)
        feats = [jnp.asarray(rng.random((2, 32 // s, 64 // s, 8)),
                             jnp.float32) for s in (1, 2, 4, 8)]
        rois = jnp.asarray(
            [[0, 4.0, 2.0, 40.0, 20.0], [1, 10.0, 5.0, 30.0, 28.0],
             [0, 0.0, 0.0, 63.0, 31.0]], jnp.float32)
        base = multilevel_roi_align(feats, rois, strides=(4, 8, 16, 32),
                                    out_size=7)
        off = jnp.zeros((3, 7, 7, 2), jnp.float32)
        dp = deform_roi_pool(feats, rois, off, strides=(4, 8, 16, 32),
                             out_size=7)
        err = float(jnp.abs(base - dp).max())
        assert err < 1e-5, err

    def test_offsets_shift_output(self, rng):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.ops.roi_align import (
            deform_roi_pool)
        feats = [jnp.asarray(rng.random((1, 32 // s, 64 // s, 4)),
                             jnp.float32) for s in (1, 2, 4, 8)]
        rois = jnp.asarray([[0, 8.0, 8.0, 40.0, 24.0]], jnp.float32)
        z = deform_roi_pool(feats, rois, jnp.zeros((1, 7, 7, 2)),
                            strides=(4, 8, 16, 32))
        s = deform_roi_pool(feats, rois, jnp.ones((1, 7, 7, 2)),
                            strides=(4, 8, 16, 32))
        assert float(jnp.abs(z - s).max()) > 1e-6


class TestDCNDeformGroups:
    def test_group4_zero_init_matches_dense_conv(self, rng):
        """deform_groups=4 with zero-init offsets reduces to a plain conv."""
        import jax
        import jax.numpy as jnp
        import flax.linen as nn
        from panoswintransformerobjectdetection_tpu.ops.deform_conv import DCN
        x = jnp.asarray(rng.random((1, 10, 12, 8)), jnp.float32)
        m = DCN(6, deform_groups=4, modulated=False)
        vs = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vs, x)
        k = vs["params"]["kernel"].reshape(3, 3, 8, 6)
        ref = nn.Conv(6, (3, 3), padding="SAME").apply(
            {"params": {"kernel": k,
                        "bias": vs["params"]["bias"]}}, x)
        err = float(jnp.abs(y - ref).max())
        assert err < 1e-4, err
