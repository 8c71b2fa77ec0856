#!/usr/bin/env python
"""Upgrade old torch checkpoints to the current naming scheme before
conversion (reference `tools/model_converters/upgrade_model_version.py`):
strips `module.` prefixes, renames legacy mmdet-1.x keys, and re-saves.

    python tools/model_converters/upgrade_model_version.py in.pth out.pth
"""

import argparse
import re


LEGACY_RENAMES = [
    (r"^bbox_head\.", "roi_head.bbox_head."),
    (r"^mask_head\.", "roi_head.mask_head."),
    (r"^bbox_roi_extractor\.", "roi_head.bbox_roi_extractor."),
    (r"^mask_roi_extractor\.", "roi_head.mask_roi_extractor."),
]


def upgrade(sd):
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        for pat, rep in LEGACY_RENAMES:
            k = re.sub(pat, rep, k)
        out[k] = v
    return out


def main():
    import torch
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    a = p.parse_args()
    ckpt = torch.load(a.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    torch.save({"state_dict": upgrade(sd),
                "meta": ckpt.get("meta", {}) if isinstance(ckpt, dict) else {}},
               a.dst)
    print(f"wrote {a.dst} ({len(sd)} keys)")


if __name__ == "__main__":
    main()
