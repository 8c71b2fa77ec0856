#!/usr/bin/env python
"""Convert pycls RegNet weights to this framework's flax tree (reference
`tools/model_converters/regnet2mmdet.py`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser(description="pycls RegNet -> flax")
    p.add_argument("src", help="pycls .pyth/.pth checkpoint")
    p.add_argument("dst", help="output orbax checkpoint dir")
    p.add_argument("--arch", default="regnetx_3.2gf")
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        convert_regnet_backbone, load_torch_state_dict)
    import orbax.checkpoint as ocp

    sd = load_torch_state_dict(args.src)
    if "model_state" in sd:
        sd = sd["model_state"]
    params, stats = convert_regnet_backbone(sd, args.arch)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.dst),
        {"params": params, "batch_stats": stats}, force=True)
    print(f"converted -> {args.dst}")


if __name__ == "__main__":
    main()
