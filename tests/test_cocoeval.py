"""COCOeval-exact evaluator fixtures.

Every expected number here is hand-derived from the pycocotools protocol
(the evaluation behind `/root/reference/mmdet/datasets/coco.py:365-478`):
greedy score-ordered matching, crowd ignore-with-rematch (crowd IoU =
intersection / det area), gt/dt area-range ignoring, per-image maxDets
truncation, 101-point interpolated AP over IoU .50:.05:.95.
"""

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.core import rle as rle_utils
from panoswintransformerobjectdetection_tpu.core.cocoeval import (
    COCOEvaluator, _match_image, evaluate_coco)


def box(x, y, w, h):
    return [float(x), float(y), float(w), float(h)]


def gt(img, cat, b, crowd=0, area=None, segmentation=None):
    return {"image_id": img, "category_id": cat, "bbox": b,
            "iscrowd": crowd, "area": area if area is not None else b[2] * b[3],
            "segmentation": segmentation}


def dt(img, cat, b, score, segmentation=None):
    d = {"image_id": img, "category_id": cat, "bbox": b, "score": score}
    if segmentation is not None:
        d["segmentation"] = segmentation
    return d


# ----------------------------------------------------------------- matching
class TestBasics:
    def test_perfect_single(self):
        stats = evaluate_coco([gt(0, 0, box(10, 10, 20, 20))],
                              [dt(0, 0, box(10, 10, 20, 20), 0.9)],
                              [0], [0])
        assert stats["mAP"] == pytest.approx(1.0)
        assert stats["mAP_50"] == pytest.approx(1.0)
        assert stats["AR@100"] == pytest.approx(1.0)

    def test_fp_before_tp_gives_half(self):
        """FP at score .9, TP at .5 -> precision envelope 0.5 everywhere."""
        stats = evaluate_coco(
            [gt(0, 0, box(10, 10, 20, 20))],
            [dt(0, 0, box(200, 200, 20, 20), 0.9),
             dt(0, 0, box(10, 10, 20, 20), 0.5)],
            [0], [0])
        assert stats["mAP"] == pytest.approx(0.5)

    def test_envelope_interpolation_exact(self):
        """5 dets / 3 gts with tp pattern [1,0,1,0,1]:
        AP = (34*1 + 33*(2/3) + 34*0.6)/101, hand-derived."""
        gts = [gt(0, 0, box(0, 0, 10, 10)),
               gt(0, 0, box(100, 0, 10, 10)),
               gt(0, 0, box(200, 0, 10, 10))]
        dts = [dt(0, 0, box(0, 0, 10, 10), 0.9),       # TP
               dt(0, 0, box(300, 300, 10, 10), 0.8),   # FP
               dt(0, 0, box(100, 0, 10, 10), 0.7),     # TP
               dt(0, 0, box(400, 300, 10, 10), 0.6),   # FP
               dt(0, 0, box(200, 0, 10, 10), 0.5)]     # TP
        stats = evaluate_coco(gts, dts, [0], [0])
        expect = (34 * 1.0 + 33 * (2 / 3) + 34 * 0.6) / 101
        assert stats["mAP_50"] == pytest.approx(expect, abs=1e-9)
        assert stats["mAP"] == pytest.approx(expect, abs=1e-9)

    def test_iou_threshold_band(self):
        """Det at IoU ~0.6 counts for thresholds .50/.55/.60 only:
        mAP = 3/10, mAP_50 = 1, mAP_75 = 0."""
        g = box(0, 0, 10, 10)
        d = box(0, 0, 10, 6.0)  # IoU = 60/100 = 0.6
        stats = evaluate_coco([gt(0, 0, g)], [dt(0, 0, d, 0.9)], [0], [0])
        assert stats["mAP_50"] == pytest.approx(1.0)
        assert stats["mAP_75"] == pytest.approx(0.0)
        assert stats["mAP"] == pytest.approx(0.3)

    def test_greedy_best_iou_order(self):
        """Higher-score det picks the best-IoU gt first; second det takes
        the remainder."""
        gts = [gt(0, 0, box(0, 0, 10, 10)), gt(0, 0, box(8, 0, 10, 10))]
        dts = [dt(0, 0, box(1, 0, 10, 10), 0.9),  # best IoU with gt0
               dt(0, 0, box(7, 0, 10, 10), 0.8)]  # left with gt1
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["mAP_50"] == pytest.approx(1.0)


# -------------------------------------------------------------------- crowd
class TestCrowd:
    def test_crowd_absorbs_extra_dets(self):
        """Dets matching only a crowd gt are ignored, not FPs — and the
        crowd can absorb many dets (rematch)."""
        gts = [gt(0, 0, box(0, 0, 10, 10)),
               gt(0, 0, box(100, 100, 200, 200), crowd=1)]
        dts = [dt(0, 0, box(0, 0, 10, 10), 0.9),
               dt(0, 0, box(110, 110, 20, 20), 0.8),   # inside crowd
               dt(0, 0, box(150, 150, 30, 30), 0.7)]   # inside crowd too
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["mAP"] == pytest.approx(1.0)
        # sanity: without the crowd flag those dets are FPs
        gts2 = [gt(0, 0, box(0, 0, 10, 10)),
                gt(0, 0, box(100, 100, 200, 200), crowd=0)]
        stats2 = evaluate_coco(gts2, dts, [0], [0])
        assert stats2["mAP"] < 1.0

    def test_crowd_iou_is_iof(self):
        """Det covering 10% of a crowd gt but fully inside it: IoF = 1.0
        matches; plain IoU (0.1) would not."""
        gts = [gt(0, 0, box(0, 0, 100, 100), crowd=1),
               gt(0, 0, box(300, 300, 10, 10))]  # real gt so npig > 0
        dts = [dt(0, 0, box(0, 0, 100, 10), 0.9),
               dt(0, 0, box(300, 300, 10, 10), 0.8)]
        stats = evaluate_coco(gts, dts, [0], [0])
        # det-in-crowd ignored at every threshold -> perfect AP from gt 2
        assert stats["mAP"] == pytest.approx(1.0)

    def test_real_gt_preferred_over_crowd(self):
        """A det overlapping both a real gt (IoU .55) and a crowd (IoF 1.0)
        must match the real gt at thr .5 (non-ignored first)."""
        gts = [gt(0, 0, box(0, 0, 10, 11.0 / 0.55 - 1), crowd=1),
               gt(0, 0, box(0, 0, 10, 10))]
        # det = gt2 shifted to IoU ~ 0.55
        dts = [dt(0, 0, box(0, 0, 10, 5.5), 0.9)]
        ev = COCOEvaluator(gts, dts, [0], [0]).evaluate()
        # matched as a true positive at .5/.55 → recall there is 1
        assert ev.recall[0, 0, 0, -1] == pytest.approx(1.0)


# -------------------------------------------------------------- area ranges
class TestAreaRanges:
    def test_small_medium_large_buckets(self):
        gts = [gt(0, 0, box(0, 0, 16, 16)),      # 256 -> small
               gt(0, 0, box(50, 50, 60, 60)),    # 3600 -> medium
               gt(0, 0, box(200, 200, 200, 200))]  # 40000 -> large
        dts = [dt(0, 0, box(0, 0, 16, 16), 0.9),
               dt(0, 0, box(50, 50, 60, 60), 0.8),
               dt(0, 0, box(200, 200, 200, 200), 0.7)]
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["mAP_s"] == pytest.approx(1.0)
        assert stats["mAP_m"] == pytest.approx(1.0)
        assert stats["mAP_l"] == pytest.approx(1.0)
        # out-of-range unmatched dets are ignored, not FPs:
        # drop the small det -> small AP 0 but medium/large still perfect
        stats = evaluate_coco(gts, dts[1:], [0], [0])
        assert stats["mAP_s"] == pytest.approx(0.0)
        assert stats["mAP_m"] == pytest.approx(1.0)
        assert stats["mAP_l"] == pytest.approx(1.0)

    def test_gt_area_field_wins(self):
        """COCO gt area is the segmentation area, not the box area — a
        16x16 box with area=5000 lands in 'medium'."""
        gts = [gt(0, 0, box(0, 0, 16, 16), area=5000.0)]
        dts = [dt(0, 0, box(0, 0, 16, 16), 0.9)]
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["mAP_m"] == pytest.approx(1.0)
        assert stats["mAP_s"] == -1.0  # no small gt at all


# ------------------------------------------------------------------ maxDets
class TestMaxDets:
    def test_ar_at_1_vs_10(self):
        """Top-1 det is an FP -> AR@1 = 0; the TP ranks second -> AR@10 = 1."""
        gts = [gt(0, 0, box(0, 0, 10, 10))]
        dts = [dt(0, 0, box(500, 500, 10, 10), 0.9),
               dt(0, 0, box(0, 0, 10, 10), 0.8)]
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["AR@1"] == pytest.approx(0.0)
        assert stats["AR@10"] == pytest.approx(1.0)

    def test_maxdets_100_truncation(self):
        """TP det ranked 120th by score inside one image+category is cut by
        the per-image maxDets=100 truncation -> AP = 0."""
        gts = [gt(0, 0, box(0, 0, 10, 10))]
        dts = [dt(0, 0, box(1000 + 20 * i, 1000, 10, 10), 0.9 - i * 1e-4)
               for i in range(119)]
        dts.append(dt(0, 0, box(0, 0, 10, 10), 0.9 - 120 * 1e-4))
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["mAP"] == pytest.approx(0.0)
        assert stats["AR@100"] == pytest.approx(0.0)
        # with the TP at rank 50 instead, it survives truncation
        dts[-1]["score"] = 0.9 - 49.5 * 1e-4
        stats = evaluate_coco(gts, dts, [0], [0])
        assert stats["AR@100"] == pytest.approx(1.0)


# -------------------------------------------------------------- multi-class
class TestMultiClass:
    def test_classes_independent(self):
        """Class-1 det on a class-0 gt is an FP for class 1 and a miss for
        class 0; class 2 is perfect; mAP averages per-class APs."""
        gts = [gt(0, 0, box(0, 0, 10, 10)), gt(0, 2, box(50, 50, 10, 10))]
        dts = [dt(0, 1, box(0, 0, 10, 10), 0.9),
               dt(0, 2, box(50, 50, 10, 10), 0.8)]
        stats = evaluate_coco(gts, dts, [0], [0, 1, 2])
        # class0: AP 0 (gt unmatched); class1: no gt -> excluded;
        # class2: AP 1 -> mAP = 0.5
        assert stats["mAP"] == pytest.approx(0.5)

    def test_proposal_mode_ignores_classes(self):
        gts = [gt(0, 0, box(0, 0, 10, 10)), gt(0, 2, box(50, 50, 10, 10))]
        dts = [dt(0, 1, box(0, 0, 10, 10), 0.9),
               dt(0, 0, box(50, 50, 10, 10), 0.8)]
        ev = COCOEvaluator(gts, dts, [0], [0, 1, 2], "proposal",
                           max_dets=(100, 300, 1000))
        stats = ev.evaluate().summarize()
        assert stats["AR@100"] == pytest.approx(1.0)


# ---------------------------------------------------- matcher differential
class TestMatcherParity:
    def test_native_matches_numpy(self):
        """C++ `match_image` and the numpy loop agree bit-for-bit on random
        crowd/ignore instances."""
        from panoswintransformerobjectdetection_tpu import native as nat
        if nat.get_lib() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(0)
        thrs = np.arange(0.5, 1.0, 0.05)
        for _ in range(50):
            D = int(rng.integers(0, 12))
            G = int(rng.integers(0, 12))
            ious = rng.random((D, G))
            ig = rng.random(G) < 0.3
            order = np.argsort(ig, kind="stable")
            ig = ig[order]  # matcher contract: non-ignored first
            crowd = (rng.random(G) < 0.3) & ig
            ref = nat.native_match_image(thrs, ious, ig, crowd) \
                if D and G else None
            if ref is None:
                continue
            # force the numpy fallback
            lib, nat._lib = nat._lib, None
            nat._tried = True
            try:
                got = _match_image(thrs, ious, ig, crowd)
            finally:
                nat._lib = lib
            np.testing.assert_array_equal(ref[0], got[0])
            np.testing.assert_array_equal(ref[1], got[1])


# ---------------------------------------------------------------------- RLE
class TestRLE:
    def test_roundtrip_random(self, rng):
        for _ in range(10):
            m = (rng.random((23, 17)) < 0.4).astype(np.uint8)
            r = rle_utils.encode(m)
            assert isinstance(r["counts"], str)
            np.testing.assert_array_equal(rle_utils.decode(r), m)
            assert rle_utils.area(r) == int(m.sum())

    def test_string_codec_negative_deltas(self):
        counts = [0, 5, 1, 2, 300, 7, 40000, 1]
        s = rle_utils._counts_to_string(counts)
        assert rle_utils._string_to_counts(s) == counts

    def test_empty_and_full(self):
        z = np.zeros((5, 4), np.uint8)
        np.testing.assert_array_equal(rle_utils.decode(rle_utils.encode(z)), z)
        o = np.ones((5, 4), np.uint8)
        np.testing.assert_array_equal(rle_utils.decode(rle_utils.encode(o)), o)
        assert rle_utils.area(rle_utils.encode(o)) == 20

    def test_polygon_integer_rect_half_open(self):
        """maskApi rasterization of an integer-corner rectangle fills the
        half-open box [x0, x1) x [y0, y1) (hand-traced through the
        5x-upsample + y-boundary algorithm)."""
        r = rle_utils.polygon_to_rle([1, 1, 1, 3, 3, 3, 3, 1], 6, 6)
        m = rle_utils.decode(r)
        expect = np.zeros((6, 6), np.uint8)
        expect[1:3, 1:3] = 1
        np.testing.assert_array_equal(m, expect)

    def test_polygon_bigger_rect(self):
        r = rle_utils.polygon_to_rle([0, 0, 0, 4, 5, 4, 5, 0], 8, 8)
        m = rle_utils.decode(r)
        expect = np.zeros((8, 8), np.uint8)
        expect[0:4, 0:5] = 1
        np.testing.assert_array_equal(m, expect)

    def test_mask_iou_crowd(self):
        a = np.zeros((10, 10), np.uint8); a[:5] = 1          # 50 px
        b = np.zeros((10, 10), np.uint8); b[:10] = 1         # 100 px
        ra, rb = rle_utils.encode(a), rle_utils.encode(b)
        iou = rle_utils.iou([ra], [rb], [0])[0, 0]
        assert iou == pytest.approx(0.5)
        iof = rle_utils.iou([ra], [rb], [1])[0, 0]
        assert iof == pytest.approx(1.0)  # intersection / det area

    def test_bbox_iou_crowd(self):
        d = np.array([[0, 0, 10, 10]], np.float64)   # xywh
        g = np.array([[0, 0, 100, 100]], np.float64)
        assert rle_utils.bbox_iou(d, g, [0])[0, 0] == pytest.approx(0.01)
        assert rle_utils.bbox_iou(d, g, [1])[0, 0] == pytest.approx(1.0)


# --------------------------------------------------------------------- segm
class TestSegm:
    def _rect_mask(self, h, w, y0, y1, x0, x1):
        m = np.zeros((h, w), np.uint8)
        m[y0:y1, x0:x1] = 1
        return rle_utils.encode(m)

    def test_segm_map_rect_masks(self):
        H = W = 64
        seg_g = self._rect_mask(H, W, 10, 30, 10, 30)
        seg_d_good = self._rect_mask(H, W, 10, 30, 10, 30)
        seg_d_half = self._rect_mask(H, W, 10, 30, 10, 20)  # IoU 0.5
        gts = [gt(0, 0, box(10, 10, 20, 20), segmentation=seg_g,
                  area=float(rle_utils.area(seg_g)))]
        stats = evaluate_coco(
            gts, [dt(0, 0, box(10, 10, 20, 20), 0.9, segmentation=seg_d_good)],
            [0], [0], iou_type="segm", img_shapes={0: (H, W)})
        assert stats["mAP"] == pytest.approx(1.0)
        stats = evaluate_coco(
            gts, [dt(0, 0, box(10, 10, 20, 20), 0.9, segmentation=seg_d_half)],
            [0], [0], iou_type="segm", img_shapes={0: (H, W)})
        # IoU .5 passes only the .50 threshold -> mAP = 1/10
        assert stats["mAP"] == pytest.approx(0.1)
        assert stats["mAP_50"] == pytest.approx(1.0)

    def test_segm_gt_polygons(self):
        """GT as COCO polygons, det as RLE."""
        H = W = 32
        poly = [[4, 4, 4, 20, 20, 20, 20, 4]]  # -> half-open [4,20)^2
        seg_d = self._rect_mask(H, W, 4, 20, 4, 20)
        gts = [{"image_id": 0, "category_id": 0, "bbox": box(4, 4, 16, 16),
                "iscrowd": 0, "area": 256.0, "segmentation": poly}]
        stats = evaluate_coco(
            gts, [dt(0, 0, box(4, 4, 16, 16), 0.9, segmentation=seg_d)],
            [0], [0], iou_type="segm", img_shapes={0: (H, W)})
        assert stats["mAP"] == pytest.approx(1.0)


# ----------------------------------------------------------- dataset plumbing
class TestDatasetEvaluate:
    def _make_dataset(self, tmp_path, with_crowd=True):
        import json
        ann = {
            "images": [{"id": 1, "file_name": "a.jpg",
                        "width": 100, "height": 100}],
            "categories": [{"id": 7, "name": "car"},
                           {"id": 9, "name": "light"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 7,
                 "bbox": [10, 10, 20, 20], "area": 400.0, "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 9,
                 "bbox": [50, 50, 30, 30], "area": 900.0, "iscrowd": 0},
            ],
        }
        if with_crowd:
            ann["annotations"].append(
                {"id": 3, "image_id": 1, "category_id": 7,
                 "bbox": [0, 60, 40, 40], "area": 1600.0, "iscrowd": 1})
        p = tmp_path / "ann.json"
        p.write_text(json.dumps(ann))
        from panoswintransformerobjectdetection_tpu.data.datasets import (
            StreetDataset)
        return StreetDataset(str(p), test_mode=True)

    def test_tiny_gt_stays_in_eval_anns(self, tmp_path):
        """pycocotools evaluates against the raw unfiltered gt json: a
        sub-pixel box is dropped from TRAINING targets (mmdet's w<1/h<1
        gate) but must stay in eval_anns, else a detection matching it
        becomes an FP and npig shrinks (mAP_s bias)."""
        import json
        ann = {
            "images": [{"id": 1, "file_name": "a.jpg",
                        "width": 100, "height": 100}],
            "categories": [{"id": 7, "name": "car"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 7,
                 "bbox": [10, 10, 0.6, 8], "area": 4.8, "iscrowd": 0},
                {"id": 2, "image_id": 1, "category_id": 7,
                 "bbox": [50, 50, 30, 30], "area": 900.0, "iscrowd": 0},
            ],
        }
        p = tmp_path / "tiny.json"
        p.write_text(json.dumps(ann))
        from panoswintransformerobjectdetection_tpu.data.datasets import (
            StreetDataset)
        ds = StreetDataset(str(p), test_mode=True)
        assert len(ds.records[0]["bboxes"]) == 1          # training gate
        evs = ds.records[0]["eval_anns"]
        assert len(evs) == 2                              # eval keeps all
        tiny = [e for e in evs if e["bbox"][2] < 1][0]
        assert tiny["bbox"] == [10, 10, 0.6, 8]
        assert tiny["area"] == pytest.approx(4.8)
        # a perfect match on the tiny gt counts as TP, detection on the
        # big one too -> mAP 1.0 (with the old filter the tiny match was
        # an FP and mAP dropped)
        dets = [{"boxes": np.array([[10, 10, 10.6, 18], [50, 50, 80, 80]]),
                 "scores": np.array([0.9, 0.8]),
                 "labels": np.array([0, 0])}]
        res = ds.evaluate(dets, metric="bbox")
        assert res["bbox_mAP"] == pytest.approx(1.0)

    def test_bbox_evaluate_with_crowd(self, tmp_path):
        ds = self._make_dataset(tmp_path)
        # crowd ann goes to ignore, not gt
        assert len(ds.records[0]["bboxes"]) == 2
        assert len(ds.records[0]["bboxes_ignore"]) == 1
        assert len(ds.records[0]["eval_anns"]) == 3
        dets = [{"boxes": np.array([[10, 10, 30, 30],     # TP car
                                    [50, 50, 80, 80],     # TP light (cls 2)
                                    [5, 65, 30, 95]]),    # in crowd -> ignored
                 "scores": np.array([0.9, 0.8, 0.7]),
                 "labels": np.array([0, 2, 0])}]
        res = ds.evaluate(dets, metric="bbox")
        assert res["bbox_mAP"] == pytest.approx(1.0)
        assert res["bbox_mAP_50"] == pytest.approx(1.0)

    def test_segm_requires_masks(self, tmp_path):
        ds = self._make_dataset(tmp_path, with_crowd=False)
        dets = [{"boxes": np.array([[10, 10, 30, 30]]),
                 "scores": np.array([0.9]), "labels": np.array([0])}]
        with pytest.raises(ValueError):
            ds.evaluate(dets, metric="segm")

    def test_proposal_metric(self, tmp_path):
        ds = self._make_dataset(tmp_path, with_crowd=False)
        dets = [{"boxes": np.array([[10, 10, 30, 30], [50, 50, 80, 80]]),
                 "scores": np.array([0.9, 0.8]),
                 "labels": np.array([4, 4])}]  # labels ignored in proposal
        res = ds.evaluate(dets, metric="proposal")
        assert res["AR@100"] == pytest.approx(1.0)
