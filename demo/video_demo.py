#!/usr/bin/env python
"""Video inference demo (reference `demo/video_demo.py`): run the detector
frame-by-frame over a video (or a directory of frames — the
`lzx_infer_folder.py` role) and write an annotated video / image folder.

    python demo/video_demo.py input.mp4 <config> [ckpt] --out out.mp4
    python demo/video_demo.py frames_dir/ <config> [ckpt] --out out_dir/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def draw(img, per_class, classes, score_thr):
    import cv2
    for c, dets in enumerate(per_class):
        for x1, y1, x2, y2, score in dets:
            if score < score_thr:
                continue
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)),
                          (0, 255, 0), 2)
            name = classes[c] if classes else str(c)
            cv2.putText(img, f"{name} {score:.2f}", (int(x1), int(y1) - 4),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input", help="video file or directory of frames")
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--out", default="video_out.mp4")
    p.add_argument("--fps", type=float, default=None)
    args = p.parse_args()

    import cv2
    from panoswintransformerobjectdetection_tpu.apis import (
        init_detector, inference_detector)
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config

    cfg = load_config(args.config)
    det, variables = init_detector(cfg, args.checkpoint)
    classes = cfg.get("classes")

    if os.path.isdir(args.input):  # frame-folder mode (lzx_infer_folder)
        os.makedirs(args.out, exist_ok=True)
        names = sorted(n for n in os.listdir(args.input)
                       if n.lower().endswith((".jpg", ".jpeg", ".png")))
        for n in names:
            path = os.path.join(args.input, n)
            per_class = inference_detector(det, variables, path,
                                           num_classes=det.num_classes)
            img = draw(cv2.imread(path), per_class, classes, args.score_thr)
            cv2.imwrite(os.path.join(args.out, n), img)
            print(f"{n}: done")
        return

    cap = cv2.VideoCapture(args.input)
    fps = args.fps or cap.get(cv2.CAP_PROP_FPS) or 25
    writer = None
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        per_class = inference_detector(det, variables, frame,
                                       num_classes=det.num_classes)
        frame = draw(frame, per_class, classes, args.score_thr)
        if writer is None:
            writer = cv2.VideoWriter(
                args.out, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (frame.shape[1], frame.shape[0]))
        writer.write(frame)
        i += 1
        if i % 25 == 0:
            print(f"frame {i}")
    if writer is not None:
        writer.release()
    cap.release()
    print(f"saved {args.out} ({i} frames)")


if __name__ == "__main__":
    main()
