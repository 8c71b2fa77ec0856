#!/usr/bin/env python
"""Webcam demo (reference `demo/webcam_demo.py`): live inference from a
capture device, annotated frames shown (or written when headless).

    python demo/webcam_demo.py <config> [ckpt] --camera-id 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--camera-id", type=int, default=0)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out-dir", default=None,
                   help="write frames here instead of cv2.imshow (headless)")
    p.add_argument("--max-frames", type=int, default=0)
    args = p.parse_args()

    import cv2
    from video_demo import draw
    from panoswintransformerobjectdetection_tpu.apis import (
        init_detector, inference_detector)
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config

    cfg = load_config(args.config)
    det, variables = init_detector(cfg, args.checkpoint)
    classes = cfg.get("classes")

    cap = cv2.VideoCapture(args.camera_id)
    assert cap.isOpened(), f"camera {args.camera_id} unavailable"
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        per_class = inference_detector(det, variables, frame,
                                       num_classes=det.num_classes)
        frame = draw(frame, per_class, classes, args.score_thr)
        if args.out_dir:
            cv2.imwrite(os.path.join(args.out_dir, f"{i:06d}.jpg"), frame)
        else:
            cv2.imshow("detections", frame)
            if cv2.waitKey(1) == 27:  # ESC
                break
        i += 1
        if args.max_frames and i >= args.max_frames:
            break
    cap.release()


if __name__ == "__main__":
    main()
