"""Full eval-protocol dress rehearsal vs the reference stack on synthetic
data (VERDICT r4 next-round #4).

Extends the single-forward e2e parity harness to the WHOLE evaluation
protocol: a synthetic COCO-format 360 dataset on disk -> OUR real CLI
(`tools/test.py --eval bbox`: config load, checkpoint conversion, dataset
parse, DetDataLoader fixed-shape batching, jitted `simple_test`,
result formatting, COCOeval) against a torch pipeline assembled from the
reference's own modules (`simple_panoswin_transformer.py:780`, `fpn.py`,
`panorpn_head.py:89`, `convfc_bbox_head.py:177`, `bbox_nms.py:7`) fed by
a transcription of the reference data-pipeline semantics
(`pipelines/loading.py LoadImageFromFile` -> Normalize -> Pad).  The mAP
numbers must agree to 1e-4 — integration bugs (loader misalignment,
formatting drops like the r4 multi-class decode fix, coordinate
conventions) live exactly in the deltas this test covers.

Evaluator note: the reference evaluates COCO metrics through
mmpycocotools (`street.py:354`), which is not installable here (no
egress); both stacks therefore share OUR COCOeval-exact evaluator — whose
protocol is itself pinned by hand-derived pycocotools fixtures
(tests/test_cocoeval.py).  The VOC-protocol leg below closes the
evaluator gap with reference code: the reference's OWN `mean_ap.eval_map`
(loaded from `/root/reference` source) is run on OUR CLI detections and
must match our `core.evaluation.eval_map` to 1e-6.
"""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reference_loader import load_reference_detstack, load_reference_detcore
import test_e2e_reference_parity as e2e

DET = load_reference_detstack()
CORE = load_reference_detcore()
pytestmark = [
    pytest.mark.skipif(DET is None or e2e.REF_PANO is None,
                       reason="reference unavailable"),
    pytest.mark.slow,
]

H, W = e2e.H, e2e.W     # reference-side simple_test pins (256, 512) metas
N_IMAGES = 80
CLASSES = ("car", "crosswalk", "light", "traffic_sign", "warning_line")


def _make_dataset(root, seed):
    """Synthetic COCO-format 360 dataset: N equirect-shaped images with
    drawn rectangles; box sizes span the s/m/l area buckets; one crowd
    annotation (RLE) exercises the ignore-with-rematch path."""
    import cv2
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(N_IMAGES):
        img = (rng.random((H, W, 3)) * 60).astype(np.uint8)
        n_box = int(rng.integers(1, 5))
        for _ in range(n_box):
            # log-uniform size 10..260 px -> hits small/medium/large
            s = float(np.exp(rng.uniform(np.log(10), np.log(260))))
            ar = float(np.exp(rng.uniform(np.log(0.6), np.log(1.8))))
            bw, bh = s * np.sqrt(ar), s / np.sqrt(ar)
            x = float(rng.uniform(0, max(W - bw, 1)))
            y = float(rng.uniform(0, max(H - bh, 1)))
            bw = min(bw, W - x - 1)
            bh = min(bh, H - y - 1)
            cat = int(rng.integers(1, len(CLASSES) + 1))
            color = tuple(int(c) for c in rng.integers(90, 255, 3))
            cv2.rectangle(img, (int(x), int(y)),
                          (int(x + bw), int(y + bh)), color, -1)
            annotations.append({
                "id": aid, "image_id": i, "category_id": cat,
                "bbox": [x, y, float(bw), float(bh)],
                "area": float(bw * bh), "iscrowd": 0,
                "segmentation": [[x, y, x, y + bh, x + bw, y + bh,
                                  x + bw, y]]})
            aid += 1
        if i == 0:
            annotations.append({
                "id": aid, "image_id": 0, "category_id": 1,
                "bbox": [0.0, 0.0, 40.0, 30.0], "area": 1200.0,
                "iscrowd": 1,
                "segmentation": {"size": [H, W],
                                 "counts": [500, 1200, H * W - 1700]}})
            aid += 1
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"), img)
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": W, "height": H})
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": k + 1, "name": n}
                          for k, n in enumerate(CLASSES)]}
    ann_file = os.path.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir


def _write_cfg(root, ann_file, img_dir):
    """Standalone config reproducing the e2e harness's nano model exactly
    (same dict `_build_my_detector` passes to the registry)."""
    model = {
        "type": "PanoFasterRCNN",
        "backbone": {"type": "PanoSwinTransformer", "embed_dim": e2e.EMBED,
                     "depths": e2e.DEPTHS, "num_heads": e2e.HEADS,
                     "window_size": e2e.WS, "ape": True,
                     "drop_path_rate": 0.0},
        "neck": {"type": "FPN",
                 "in_channels": tuple(e2e.EMBED * 2 ** i for i in range(4)),
                 "out_channels": e2e.FPN_OUT, "num_outs": 5},
        "num_classes": e2e.NUM_CLASSES,
        "roi_sampling_ratio": 0,
        "test_cfg": {
            "rpn": dict(nms_pre=e2e.RPN_CFG["nms_pre"],
                        max_per_img=e2e.RPN_CFG["max_per_img"],
                        iou_threshold=e2e.RPN_CFG["nms"]["iou_threshold"],
                        min_bbox_size=e2e.RPN_CFG["min_bbox_size"]),
            "rcnn": dict(score_thr=e2e.RCNN_CFG["score_thr"],
                         iou_threshold=e2e.RCNN_CFG["nms"]["iou_threshold"],
                         max_per_img=e2e.RCNN_CFG["max_per_img"]),
        },
    }
    pipeline = [dict(type="LoadImageFromFile"),
                dict(type="Normalize", mean=[0, 0, 0],
                     std=[255, 255, 255], to_rgb=True),
                dict(type="Pad", size_divisor=32)]
    cfg_path = os.path.join(root, "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(f"model = {model!r}\n")
        f.write("data = dict(\n"
                "    samples_per_gpu=4, workers_per_gpu=0,\n"
                f"    test=dict(type='StreetDataset', ann_file={ann_file!r},\n"
                f"              img_prefix={img_dir!r},\n"
                f"              pipeline={pipeline!r}))\n")
    return cfg_path


def _reference_results(ref_det, img_dir):
    """The reference pipeline: cv2 BGR load -> to_rgb flip -> /255
    normalize -> NCHW -> torch simple_test -> per-image detection dicts
    (the `bbox2result` formatting contract, in original coords)."""
    import cv2
    import torch
    results = []
    for i in range(N_IMAGES):
        img = cv2.imread(os.path.join(img_dir, f"{i}.jpg"),
                         cv2.IMREAD_COLOR).astype(np.float32)
        img = img[..., ::-1] / 255.0
        x = torch.from_numpy(np.ascontiguousarray(
            np.moveaxis(img, -1, 0))[None])
        (props, det_bboxes, det_labels), = ref_det.simple_test(x)
        det = det_bboxes.numpy()
        results.append({"boxes": det[:, :4].astype(np.float32),
                        "scores": det[:, 4].astype(np.float32),
                        "labels": det_labels.numpy().astype(np.int64)})
    return results


def _to_per_class(results, num_classes):
    """per-image dict -> mmdet `det_results` nesting (per image, per
    class (n, 5) arrays) for the VOC eval_map protocol."""
    out = []
    for r in results:
        per_cls = []
        for c in range(num_classes):
            m = r["labels"] == c
            per_cls.append(np.concatenate(
                [r["boxes"][m], r["scores"][m, None]],
                axis=1).astype(np.float32))
        out.append(per_cls)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_eval_protocol_dress_rehearsal(seed, tmp_path):
    import torch
    root = str(tmp_path)
    ann_file, img_dir = _make_dataset(root, seed)
    cfg_path = _write_cfg(root, ann_file, img_dir)

    ref_det = e2e._build_reference_detector(seed)
    ckpt = os.path.join(root, "ref.pth")
    torch.save(ref_det.state_dict(), ckpt)

    # ---- OUR stack, through the real CLI entrypoint
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import importlib
    test_cli = importlib.import_module("test")
    out_pkl = os.path.join(root, "ours.pkl")
    metrics_ours = test_cli.main([cfg_path, ckpt, "--eval", "bbox",
                                  "--batch-size", "4", "--out", out_pkl])
    with open(out_pkl, "rb") as f:
        results_ours = pickle.load(f)

    # ---- reference stack end-to-end on the same dataset
    ref_results = _reference_results(ref_det, img_dir)

    from panoswintransformerobjectdetection_tpu.data.builder import (
        build_dataset)
    from panoswintransformerobjectdetection_tpu.runtime.config import (
        load_config)
    cfg = load_config(cfg_path)
    dataset = build_dataset(cfg["data"]["test"])
    metrics_ref = dataset.evaluate(ref_results, metric=["bbox"])

    # the two stacks saw the same images through independent loaders and
    # independent detector implementations; their protocol-level numbers
    # must agree
    for key in ("bbox_mAP", "bbox_mAP_50", "bbox_mAP_75", "bbox_mAP_s",
                "bbox_mAP_m", "bbox_mAP_l", "bbox_AR@100"):
        a, b = metrics_ours[key], metrics_ref[key]
        assert a == pytest.approx(b, abs=1e-4), \
            f"seed {seed} {key}: ours {a} vs reference-stack {b}"

    # detections themselves must align per image (catches compensating
    # evaluator errors that could fake mAP agreement)
    n_match = sum(len(a["scores"]) == len(b["scores"])
                  for a, b in zip(results_ours, ref_results))
    assert n_match >= N_IMAGES - 2, f"det-count mismatch on {N_IMAGES - n_match} images"

    # ---- VOC-protocol leg with the REFERENCE'S OWN evaluator code
    if CORE is not None:
        from panoswintransformerobjectdetection_tpu.core.evaluation import (
            eval_map)
        det_results = _to_per_class(results_ours, len(CLASSES))
        annotations = [{"bboxes": r["bboxes"].astype(np.float32),
                        "labels": r["labels"].astype(np.int64)}
                       for r in dataset.records]
        mine, _ = eval_map(det_results, annotations, iou_thr=0.5)
        theirs, _ = CORE.eval_map(det_results, annotations, iou_thr=0.5)
        assert mine == pytest.approx(theirs, abs=1e-6), \
            f"VOC eval_map: ours {mine} vs reference {theirs}"
