#!/usr/bin/env python
"""COCO error analysis (reference `tools/analysis_tools/coco_error_analysis.py`,
the pycocotools `analyze()` protocol).

For each class, decomposes the precision-recall behaviour into the classic
error ladder by progressively relaxing the evaluation:

  C75  — AP at IoU .75
  C50  — AP at IoU .50
  Loc  — AP at IoU .10 (localization errors forgiven)
  Oth  — Loc + detections that match a gt of ANY other class are ignored
         (class-confusion errors forgiven)
  BG   — Oth + all remaining unmatched detections removed (background
         false positives forgiven: precision = 1 up to achieved recall)
  FN   — 1.0 (missed gts forgiven)

    python tools/analysis_tools/coco_error_analysis.py <cfg> <results.pkl> \
        --out-dir work_dirs/analysis

Writes a JSON gains table and (if matplotlib is available) a per-class
stacked PR plot.
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def _ap_from_evaluator(ev):
    """Mean AP over classes from a run COCOEvaluator ('all', top maxDet)."""
    s = ev.precision[:, :, :, 0, -1]
    valid = s[s > -1]
    return float(valid.mean()) if valid.size else float("nan")


def analyze_results(dataset, results, cat_ids=None):
    """Returns {class_name: {C75, C50, Loc, Oth, BG, FN}} per-class APs."""
    from panoswintransformerobjectdetection_tpu.core.cocoeval import (
        COCOEvaluator)

    gt_anns = [a for r in dataset.records for a in r["eval_anns"]]
    img_ids = [r["id"] for r in dataset.records]
    dt_anns = dataset.det2anns(results)
    all_cats = list(range(len(dataset.CLASSES)))
    cats = cat_ids if cat_ids is not None else sorted(
        {a["category_id"] for a in gt_anns})

    out = {}
    for c in cats:
        name = dataset.CLASSES[c]
        gt_c = [dict(a) for a in gt_anns if a["category_id"] == c]
        dt_c = [a for a in dt_anns if a["category_id"] == c]
        if not gt_c:
            continue

        def ap(iou_thr, gts=gt_c, dts=dt_c):
            ev = COCOEvaluator(gts, dts, img_ids, [c], "bbox",
                               iou_thrs=np.array([iou_thr]))
            return _ap_from_evaluator(ev.evaluate())

        c75 = ap(0.75)
        c50 = ap(0.50)
        loc = ap(0.10)

        # Oth: gts of OTHER classes become ignore regions of THIS class —
        # detections hitting them are absorbed, not counted as FPs.
        gt_oth = gt_c + [
            {**a, "category_id": c, "ignore": 1, "iscrowd": 1}
            for a in gt_anns if a["category_id"] != c]
        oth = ap(0.10, gts=gt_oth)

        # BG: additionally drop every detection that still doesn't reach
        # any gt at IoU .1 (perfect background rejection).
        from panoswintransformerobjectdetection_tpu.core.rle import bbox_iou
        keep = []
        by_img = {}
        for a in gt_oth:
            by_img.setdefault(a["image_id"], []).append(a["bbox"])
        for d in dt_c:
            gbs = by_img.get(d["image_id"], [])
            if gbs and bbox_iou(np.array([d["bbox"]]), np.array(gbs),
                                [0] * len(gbs)).max() >= 0.1:
                keep.append(d)
        bg = ap(0.10, gts=gt_oth, dts=keep)
        out[name] = {"C75": c75, "C50": c50, "Loc": loc, "Oth": oth,
                     "BG": bg, "FN": 1.0}
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="pickle from tools/test.py --out")
    p.add_argument("--out-dir", default="work_dirs/error_analysis")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args(argv)

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    dataset = build_dataset(cfg["data"]["test"])
    with open(args.results, "rb") as f:
        results = pickle.load(f)

    table = analyze_results(dataset, results)
    os.makedirs(args.out_dir, exist_ok=True)
    out_json = os.path.join(args.out_dir, "error_analysis.json")
    with open(out_json, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))
    print(f"wrote {out_json}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        names = list(table)
        keys = ["C75", "C50", "Loc", "Oth", "BG", "FN"]
        vals = np.array([[table[n][k] for k in keys] for n in names])
        fig, ax = plt.subplots(figsize=(max(6, len(names)), 4))
        bottom = np.zeros(len(names))
        for i, k in enumerate(keys):
            h = vals[:, i] - (vals[:, i - 1] if i else 0)
            ax.bar(names, h, bottom=bottom, label=k)
            bottom += h
        ax.set_ylabel("AP")
        ax.legend()
        fig.autofmt_xdate()
        fig.savefig(os.path.join(args.out_dir, "error_analysis.png"),
                    bbox_inches="tight")
        print(f"wrote {os.path.join(args.out_dir, 'error_analysis.png')}")
    return table


if __name__ == "__main__":
    main()
