#!/usr/bin/env python
"""Assemble rendered result images into an animated GIF (reference
`demo/create_result_gif.py:1` role).  Input is a directory of frames —
e.g. the output of `demo/folder_demo.py` or
`tools/analyze_results.py` — written with Pillow (imageio not needed)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def create_gif(frames, out, duration_ms=500):
    from PIL import Image
    imgs = [Image.open(f).convert("P", palette=Image.ADAPTIVE)
            for f in frames]
    imgs[0].save(out, save_all=True, append_images=imgs[1:],
                 duration=duration_ms, loop=0)


def main():
    p = argparse.ArgumentParser(description="Create GIF from result frames")
    p.add_argument("image_dir", help="directory of rendered result images")
    p.add_argument("--out", default="result.gif")
    p.add_argument("--duration", type=float, default=0.5,
                   help="seconds per frame")
    args = p.parse_args()

    frames = sorted(
        os.path.join(args.image_dir, n) for n in os.listdir(args.image_dir)
        if os.path.splitext(n)[1].lower() in IMG_EXTS)
    if not frames:
        raise SystemExit(f"no images found in {args.image_dir}")
    create_gif(frames, args.out, duration_ms=int(args.duration * 1000))
    print(f"saved {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
