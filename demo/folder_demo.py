#!/usr/bin/env python
"""Folder inference demo (reference `demo/lzx_infer_folder.py:1` role):
run the detector over every image in a directory and save rendered
detections to a target folder.  The model is jit-compiled once; every
image rides the same fixed-shape executable."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("target_fd", help="directory to save rendered results")
    p.add_argument("img_dir", help="directory of input images")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import cv2
    from panoswintransformerobjectdetection_tpu.apis import (
        init_detector, inference_detector)
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.utils.visualize import (
        imshow_det_bboxes)
    import numpy as np

    cfg = load_config(args.config)
    det, variables = init_detector(cfg, args.checkpoint)
    classes = cfg.get("classes")
    os.makedirs(args.target_fd, exist_ok=True)

    names = sorted(n for n in os.listdir(args.img_dir)
                   if os.path.splitext(n)[1].lower() in IMG_EXTS)
    if not names:
        print(f"no images in {args.img_dir}")
        return
    for n in names:
        path = os.path.join(args.img_dir, n)
        per_class = inference_detector(det, variables, path,
                                       num_classes=det.num_classes)
        boxes, labels, scores = [], [], []
        for c, dets in enumerate(per_class):
            for x1, y1, x2, y2, s in dets:
                boxes.append([x1, y1, x2, y2])
                labels.append(c)
                scores.append(s)
        img = cv2.imread(path)
        out = os.path.join(args.target_fd, n)
        imshow_det_bboxes(
            img, np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32),
            scores=np.asarray(scores, np.float32),
            class_names=classes, score_thr=args.score_thr, out_file=out)
        print(f"{path} -> {out} ({len(boxes)} raw dets)")


if __name__ == "__main__":
    main()
