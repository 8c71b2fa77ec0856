#!/usr/bin/env python
"""Visualize pipeline outputs (reference `tools/misc/browse_dataset.py`):
runs the train pipeline on N samples and writes annotated images."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--out-dir", default="browse_out")
    p.add_argument("--num", type=int, default=10)
    args = p.parse_args()

    import numpy as np
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset
    from panoswintransformerobjectdetection_tpu.utils.visualize import imshow_det_bboxes

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["train"]["classes"] = cfg["classes"]
    ds = build_dataset(cfg["data"]["train"])
    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(min(args.num, len(ds))):
        s = ds[i]
        img = s["img"]
        img = (img - img.min()) / max(img.max() - img.min(), 1e-6) * 255
        imshow_det_bboxes(img.astype(np.uint8), s["gt_bboxes"], s["gt_labels"],
                          class_names=ds.CLASSES, score_thr=-1,
                          out_file=os.path.join(args.out_dir, f"{i}.jpg"))
    print(f"wrote {min(args.num, len(ds))} images to {args.out_dir}/")


if __name__ == "__main__":
    main()
