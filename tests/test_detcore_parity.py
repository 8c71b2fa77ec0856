"""Golden parity of the detection core vs the reference's own torch code.

Everything after the backbone that decides boxes — anchors, IoU, delta
coder, MaxIoU assignment, RPN proposal generation, VOC mean_ap — is pure
torch/numpy in the reference (`mmdet/core/...`, `panorpn_head.py`) and is
imported here under the stub machinery of `reference_loader.py`, then
diffed against this repo's implementations on random fixtures.  This is
the strongest achievable substitute for converted-checkpoint mAP runs
while the published weights/datasets are unreachable (BASELINE.md #1).

mmcv's CUDA NMS is external (not reference source); `reference_loader`
transcribes its documented semantics as scalar torch, so the RPN test
pins my fused TPU proposal path against the reference's *control flow*
with exact-NMS semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from reference_loader import load_reference_detcore

from panoswintransformerobjectdetection_tpu.core.anchors import AnchorGenerator
from panoswintransformerobjectdetection_tpu.core.bbox import (
    bbox_overlaps, delta_encode, delta_decode)
from panoswintransformerobjectdetection_tpu.core.assigner import max_iou_assign
from panoswintransformerobjectdetection_tpu.core.evaluation import (
    eval_map, tpfp_default)
from panoswintransformerobjectdetection_tpu.models.rpn_head import (
    rpn_proposals)

ref = load_reference_detcore()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _rand_boxes(rng, n, w=320, h=240, min_size=2.0):
    x1 = rng.uniform(0, w - min_size, n)
    y1 = rng.uniform(0, h - min_size, n)
    bw = rng.uniform(min_size, w / 3, n)
    bh = rng.uniform(min_size, h / 3, n)
    return np.stack([x1, y1, np.minimum(x1 + bw, w),
                     np.minimum(y1 + bh, h)], -1).astype(np.float32)


class TestAnchorGenerator:
    """vs `mmdet/core/anchor/anchor_generator.py:10`."""

    CASES = [
        # (strides, ratios, scales, octave_base_scale, scales_per_octave,
        #  center_offset)  — RPN / Retina / center-offset variants
        ([4, 8, 16, 32, 64], [0.5, 1.0, 2.0], [8], None, None, 0.0),
        ([8, 16, 32, 64, 128], [0.5, 1.0, 2.0], None, 4, 3, 0.0),
        ([16], [1.0], [2, 4, 8], None, None, 0.5),
        ([(4, 8)], [0.25, 4.0], [16], None, None, 0.0),
    ]

    @pytest.mark.parametrize("case", CASES)
    def test_grid_anchors(self, case):
        strides, ratios, scales, obs, spo, off = case
        import torch
        kw = dict(strides=strides, ratios=ratios, center_offset=off)
        if scales is not None:
            kw["scales"] = scales
        else:
            kw["octave_base_scale"] = obs
            kw["scales_per_octave"] = spo
        rg = ref.AnchorGenerator(**kw)
        mg = AnchorGenerator(**kw)
        sizes = [(7 + i, 11 + i) for i in range(len(strides))]
        ra = rg.grid_anchors(sizes, device="cpu")
        ma = mg.grid_anchors(sizes)
        for lvl, (r, m) in enumerate(zip(ra, ma)):
            np.testing.assert_allclose(m, r.numpy(), atol=1e-4,
                                       err_msg=f"level {lvl}")

    def test_valid_flags(self):
        import torch
        kw = dict(strides=[4, 8, 16], ratios=[0.5, 1.0, 2.0], scales=[8])
        rg = ref.AnchorGenerator(**kw)
        mg = AnchorGenerator(**kw)
        sizes = [(50, 75), (25, 38), (13, 19)]
        pad_shape = (190, 280)
        rf = rg.valid_flags(sizes, pad_shape, device="cpu")
        mf = mg.valid_flags(sizes, pad_shape)
        for lvl, (r, m) in enumerate(zip(rf, mf)):
            np.testing.assert_array_equal(m, r.numpy(),
                                          err_msg=f"level {lvl}")


class TestBboxOverlaps:
    """vs `mmdet/core/bbox/iou_calculators/iou2d_calculator.py`."""

    @pytest.mark.parametrize("mode", ["iou", "iof"])
    def test_pairwise(self, mode, rng):
        import torch
        a = _rand_boxes(rng, 37)
        b = _rand_boxes(rng, 29)
        r = ref.bbox_overlaps_t(torch.from_numpy(a), torch.from_numpy(b),
                                mode=mode).numpy()
        m = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b),
                                     mode=mode))
        np.testing.assert_allclose(m, r, atol=1e-5)

    def test_degenerate_and_disjoint(self, rng):
        import torch
        a = np.array([[0, 0, 10, 10], [5, 5, 5, 5], [100, 100, 110, 120]],
                     np.float32)
        b = np.array([[0, 0, 10, 10], [200, 200, 210, 220]], np.float32)
        r = ref.bbox_overlaps_t(torch.from_numpy(a),
                                torch.from_numpy(b)).numpy()
        m = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(m, r, atol=1e-6)


class TestDeltaCoder:
    """vs `mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:10`."""

    STDS = [(1., 1., 1., 1.), (0.1, 0.1, 0.2, 0.2)]

    @pytest.mark.parametrize("stds", STDS)
    def test_encode(self, stds, rng):
        import torch
        props = _rand_boxes(rng, 64)
        gts = _rand_boxes(rng, 64)
        r = ref.bbox2delta(torch.from_numpy(props), torch.from_numpy(gts),
                           means=(0., 0., 0., 0.), stds=stds).numpy()
        m = np.asarray(delta_encode(jnp.asarray(props), jnp.asarray(gts),
                                    stds=stds))
        np.testing.assert_allclose(m, r, atol=1e-4)

    @pytest.mark.parametrize("stds", STDS)
    def test_decode_with_clamps_and_clip(self, stds, rng):
        import torch
        rois = _rand_boxes(rng, 64)
        # large deltas to exercise the wh_ratio_clip clamp
        deltas = rng.normal(0, 3.0, (64, 4)).astype(np.float32)
        r = ref.delta2bbox(torch.from_numpy(rois), torch.from_numpy(deltas),
                           means=(0., 0., 0., 0.), stds=stds,
                           max_shape=(240, 320),
                           wh_ratio_clip=16 / 1000).numpy()
        m = np.asarray(delta_decode(jnp.asarray(rois), jnp.asarray(deltas),
                                    stds=stds, max_shape=(240, 320)))
        np.testing.assert_allclose(m, r, atol=1e-3)

    def test_decode_multiclass_columns(self, rng):
        import torch
        rois = _rand_boxes(rng, 16)
        deltas = rng.normal(0, 1.0, (16, 12)).astype(np.float32)  # 3 classes
        r = ref.delta2bbox(torch.from_numpy(rois), torch.from_numpy(deltas),
                           means=(0., 0., 0., 0.),
                           stds=(0.1, 0.1, 0.2, 0.2)).numpy()
        m = np.asarray(delta_decode(jnp.asarray(rois), jnp.asarray(deltas),
                                    stds=(0.1, 0.1, 0.2, 0.2)))
        np.testing.assert_allclose(m, r, atol=1e-3)


class TestMaxIoUAssigner:
    """vs `mmdet/core/bbox/assigners/max_iou_assigner.py:10` — including
    the gt-argmax low-quality matching and its later-gt-overrides rule."""

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("match_low_quality", [True, False])
    def test_assign(self, seed, match_low_quality):
        import torch
        rng = np.random.default_rng(seed)
        anchors = _rand_boxes(rng, 200)
        gts = _rand_boxes(rng, 7)
        ra = ref.MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                min_pos_iou=0.3,
                                match_low_quality=match_low_quality)
        res = ra.assign(torch.from_numpy(anchors), torch.from_numpy(gts))
        ious = bbox_overlaps(jnp.asarray(gts), jnp.asarray(anchors))
        mine, _ = max_iou_assign(ious, jnp.ones(len(gts), bool),
                                 pos_iou_thr=0.7, neg_iou_thr=0.3,
                                 min_pos_iou=0.3,
                                 match_low_quality=match_low_quality)
        # conventions match: -1 unassigned, 0 negative, g+1 positive
        np.testing.assert_array_equal(np.asarray(mine),
                                      res.gt_inds.numpy())

    def test_tuple_neg_thr(self):
        """Reference supports neg_iou_thr=(lo, hi); semantics: negative if
        lo <= iou < hi.  Pin the scalar case both agree on."""
        import torch
        anchors = np.array([[0, 0, 10, 10], [0, 0, 9, 9], [50, 50, 60, 60]],
                           np.float32)
        gts = np.array([[0, 0, 10, 10]], np.float32)
        ra = ref.MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                min_pos_iou=0.3)
        res = ra.assign(torch.from_numpy(anchors), torch.from_numpy(gts))
        ious = bbox_overlaps(jnp.asarray(gts), jnp.asarray(anchors))
        mine, _ = max_iou_assign(ious, jnp.ones(1, bool), 0.7, 0.3, 0.3)
        np.testing.assert_array_equal(np.asarray(mine), res.gt_inds.numpy())


class TestRPNGetBboxes:
    """vs `panorpn_head.py:89 _get_bboxes`: per-level topk -> decode ->
    level-id batched NMS -> max_per_img, on random multi-level heads."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_proposals_match(self, seed):
        import torch
        rng = np.random.default_rng(seed)
        B = 2
        strides = [4, 8, 16, 32, 64]
        sizes = [(16, 24), (8, 12), (4, 6), (2, 3), (1, 2)]
        A = 3
        gen = AnchorGenerator(strides=strides, ratios=[0.5, 1.0, 2.0],
                              scales=[8])
        anchors = gen.grid_anchors(sizes)

        cls_scores = [rng.normal(0, 1, (B, A, h, w)).astype(np.float32)
                      for (h, w) in sizes]
        bbox_preds = [rng.normal(0, 0.5, (B, A * 4, h, w)).astype(np.float32)
                      for (h, w) in sizes]
        img_h, img_w = 240, 320
        cfg = dict(nms_pre=60, max_per_img=40,
                   nms=dict(type="nms", iou_threshold=0.7),
                   min_bbox_size=0)

        ref_out = ref.rpn_get_bboxes(
            [torch.from_numpy(c) for c in cls_scores],
            [torch.from_numpy(b) for b in bbox_preds],
            [torch.from_numpy(a) for a in anchors],
            [(img_h, img_w, 3)] * B, cfg)

        mine = rpn_proposals(
            [jnp.asarray(c.transpose(0, 2, 3, 1)) for c in cls_scores],
            [jnp.asarray(b.transpose(0, 2, 3, 1)) for b in bbox_preds],
            [jnp.asarray(a) for a in anchors],
            jnp.asarray([[img_h, img_w]] * B, jnp.float32),
            nms_pre=cfg["nms_pre"], max_per_img=cfg["max_per_img"],
            iou_threshold=0.7, min_bbox_size=0)

        for b in range(B):
            r = ref_out[b].numpy()                      # (n, 5) score-sorted
            mmask = np.asarray(mine.mask[b])
            mb = np.asarray(mine.boxes[b])[mmask]
            ms = np.asarray(mine.scores[b])[mmask]
            order = np.argsort(-ms)
            mb, ms = mb[order], ms[order]
            assert len(mb) == len(r), (len(mb), len(r))
            np.testing.assert_allclose(ms, r[:, 4], atol=1e-5)
            np.testing.assert_allclose(mb, r[:, :4], atol=1e-2)


class TestMeanAP:
    """vs `mmdet/core/evaluation/mean_ap.py` (tpfp_default + eval_map)."""

    def _fixture(self, seed, num_imgs=4, num_classes=3):
        rng = np.random.default_rng(seed)
        det_results, annotations = [], []
        for _ in range(num_imgs):
            per_cls = []
            for _c in range(num_classes):
                n = int(rng.integers(0, 12))
                boxes = _rand_boxes(rng, n)
                scores = rng.uniform(0, 1, (n, 1)).astype(np.float32)
                per_cls.append(np.hstack([boxes, scores]))
            det_results.append(per_cls)
            g = int(rng.integers(0, 8))
            annotations.append({
                "bboxes": _rand_boxes(rng, g),
                "labels": rng.integers(0, num_classes, g).astype(np.int64),
            })
        return det_results, annotations

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_tpfp_default(self, seed):
        rng = np.random.default_rng(seed)
        det = np.hstack([_rand_boxes(rng, 20),
                         rng.uniform(0, 1, (20, 1))]).astype(np.float32)
        gt = _rand_boxes(rng, 6)
        gti = _rand_boxes(rng, 2)
        for area_ranges in (None, [(0, 32), (32, 1e5)]):
            rtp, rfp = ref.tpfp_default(det, gt, gti, 0.5, area_ranges)
            mtp, mfp = tpfp_default(det, gt, gti, 0.5, area_ranges)
            np.testing.assert_array_equal(mtp, rtp)
            np.testing.assert_array_equal(mfp, rfp)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_eval_map(self, seed):
        det_results, annotations = self._fixture(seed)
        r_map, r_res = ref.eval_map(det_results, annotations, iou_thr=0.5,
                                    nproc=1)
        m_map, m_res = eval_map(det_results, annotations, iou_thr=0.5)
        assert abs(m_map - r_map) < 1e-6
        for rr, mr in zip(r_res, m_res):
            assert rr["num_gts"] == mr["num_gts"]
            assert rr["num_dets"] == mr["num_dets"]
            np.testing.assert_allclose(mr["ap"], rr["ap"], atol=1e-6)

    def test_eval_map_scale_ranges_and_voc07(self, rng):
        det_results, annotations = self._fixture(7)
        r_map, _ = ref.eval_map(det_results, annotations,
                                scale_ranges=[(0, 32), (32, 1e3)],
                                iou_thr=0.5, nproc=1)
        m_map, _ = eval_map(det_results, annotations,
                            scale_ranges=[(0, 32), (32, 1e3)], iou_thr=0.5)
        np.testing.assert_allclose(m_map, r_map, atol=1e-6)

        r07, _ = ref.eval_map(det_results, annotations, iou_thr=0.5,
                              dataset="voc07", nproc=1)
        m07, _ = eval_map(det_results, annotations, iou_thr=0.5,
                          dataset="voc07")
        assert abs(m07 - r07) < 1e-6
