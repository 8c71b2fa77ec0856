#!/usr/bin/env python
"""Rank images by detection quality and render the best/worst (reference
`tools/analysis_tools/analyze_results.py`)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results")
    p.add_argument("--out-dir", default="analysis_out")
    p.add_argument("--topk", type=int, default=10)
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset
    from panoswintransformerobjectdetection_tpu.core.evaluation import eval_map_coco
    from panoswintransformerobjectdetection_tpu.utils.visualize import imshow_det_bboxes
    import cv2

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    ds = build_dataset(cfg["data"]["test"])
    with open(args.results, "rb") as f:
        results = pickle.load(f)

    scores = []
    for det, rec in zip(results, ds.records):
        m = eval_map_coco([det], [{"bboxes": rec["bboxes"],
                                   "labels": rec["labels"]}],
                          num_classes=len(ds.CLASSES))
        scores.append(m["bbox_mAP"])
    order = np.argsort(scores)
    os.makedirs(args.out_dir, exist_ok=True)
    for tag, idxs in (("worst", order[:args.topk]), ("best", order[-args.topk:])):
        for i in idxs:
            rec = ds.records[i]
            img = cv2.imread(os.path.join(ds.img_prefix, rec["filename"]))
            if img is None:
                continue
            det = results[i]
            imshow_det_bboxes(img, np.asarray(det["boxes"]),
                              np.asarray(det["labels"]),
                              np.asarray(det["scores"]), ds.CLASSES,
                              out_file=os.path.join(
                                  args.out_dir, f"{tag}_{scores[i]:.3f}_{i}.jpg"))
    print(f"wrote analyses to {args.out_dir}/")


if __name__ == "__main__":
    main()
