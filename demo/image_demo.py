#!/usr/bin/env python
"""Single-image demo (reference `demo/image_demo.py:6`):
init_detector -> inference_detector -> draw + save."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--checkpoint", dest="checkpoint_opt", default=None,
                   help="alias for the positional checkpoint argument")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out-file", default="demo_out.jpg")
    p.add_argument("--dump-json", default=None,
                   help="write [{bbox, score, label}] (detections above "
                        "--score-thr) to this path")
    args = p.parse_args()
    if args.checkpoint_opt is not None:
        args.checkpoint = args.checkpoint_opt

    import cv2
    import numpy as np
    from panoswintransformerobjectdetection_tpu.apis import (
        init_detector, inference_detector)
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config

    cfg = load_config(args.config)
    det, variables = init_detector(cfg, args.checkpoint)
    per_class = inference_detector(det, variables, args.img,
                                   num_classes=det.num_classes)

    img = cv2.imread(args.img)
    classes = cfg.get("classes")
    records = []
    for c, dets in enumerate(per_class):
        for x1, y1, x2, y2, score in dets:
            if score < args.score_thr:
                continue
            records.append({"bbox": [float(x1), float(y1),
                                     float(x2), float(y2)],
                            "score": float(score), "label": int(c)})
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            name = classes[c] if classes else str(c)
            cv2.putText(img, f"{name} {score:.2f}", (int(x1), int(y1) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    cv2.imwrite(args.out_file, img)
    print(f"saved {args.out_file}")
    if args.dump_json:
        import json
        records.sort(key=lambda r: -r["score"])
        with open(args.dump_json, "w") as f:
            json.dump(records, f, indent=1)
        print(f"saved {args.dump_json} ({len(records)} detections)")


if __name__ == "__main__":
    main()
