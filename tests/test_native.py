"""Native C++ COCO matcher: build + parity with the numpy path."""

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.native import (
    get_lib, native_match_class)


class TestNativeCocoEval:
    def test_builds(self):
        assert get_lib() is not None, "g++ build of cocoeval.cpp failed"

    def test_matches_numpy_greedy(self, rng):
        from panoswintransformerobjectdetection_tpu.core import evaluation as E
        for trial in range(5):
            D, G = 40, 12
            det = rng.random((D, 4)).astype(np.float32) * 50
            det[:, 2:] += det[:, :2] + 3
            gt = rng.random((G, 4)).astype(np.float32) * 50
            gt[:, 2:] += gt[:, :2] + 3
            scores = np.sort(rng.random(D).astype(np.float32))[::-1]
            native = native_match_class(det, gt, 0.5)
            # numpy reference path (original implementation)
            iou = E._iou_matrix(det, gt)
            matched = np.zeros(G, bool)
            tp = np.zeros(D, bool)
            for i in range(D):
                j, best = -1, 0.5
                for g in range(G):
                    if matched[g]:
                        continue
                    if iou[i, g] >= best:
                        best, j = iou[i, g], g
                if j >= 0:
                    matched[j] = True
                    tp[i] = True
            np.testing.assert_array_equal(native, tp)

    def test_eval_uses_native(self, rng):
        from panoswintransformerobjectdetection_tpu.core.evaluation import eval_map_coco
        gts = [{"bboxes": np.array([[0, 0, 10, 10.]]), "labels": np.array([0])}]
        dets = [{"boxes": np.array([[0, 0, 10, 10.]]), "scores": np.array([0.9]),
                 "labels": np.array([0])}]
        assert eval_map_coco(dets, gts, 1)["bbox_mAP"] == 1.0
