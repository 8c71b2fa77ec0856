#!/usr/bin/env python
"""Pick the representative config per method family for regression training
(reference `.dev_scripts/benchmark_filter.py`): four benchmark groups
(basic arch / datasets / data pipeline / nn modules) drawn from the config
zoo, emitted as a newline list or json for `convert_benchmark_script.py`.
"""

import argparse
import json
import os

basic_arch_root = [
    "atss", "cascade_rcnn", "cascade_rpn", "centripetalnet", "cornernet",
    "detectors", "detr", "double_heads", "dynamic_rcnn", "faster_rcnn",
    "fcos", "foveabox", "fsaf", "gfl", "grid_rcnn", "guided_anchoring",
    "htc", "libra_rcnn", "mask_rcnn", "ms_rcnn", "nas_fcos", "paa",
    "pisa", "point_rend", "reppoints", "retinanet", "rpn", "sabl",
    "ssd", "vfnet", "yolact", "yolo", "sparse_rcnn", "scnet",
    "panoswin", "swin",
]
datasets_root = ["wider_face", "pascal_voc", "cityscapes", "lvis",
                 "deepfashion"]
data_pipeline_root = ["albu_example", "instaboost", "ssd", "panoswin"]
nn_module_root = ["carafe", "dcn", "empirical_attention", "gcnet",
                  "gn", "gn+ws", "hrnet", "pafpn", "nas_fpn", "regnet",
                  "resnest", "res2net", "groie", "fpg"]


def _first_leaf(cfg_dir, prefer="r50"):
    """Smallest representative leaf: prefer the vanilla R-50 1x recipe."""
    if not os.path.isdir(cfg_dir):
        return None
    leaves = sorted(f for f in os.listdir(cfg_dir) if f.endswith(".py"))
    if not leaves:
        return None
    ranked = sorted(
        leaves,
        key=lambda f: (prefer not in f, "1x" not in f, len(f)))
    return os.path.join(cfg_dir, ranked[0])


def main():
    p = argparse.ArgumentParser(description="Filter configs to benchmark")
    p.add_argument("--basic-arch", action="store_true")
    p.add_argument("--datasets", action="store_true")
    p.add_argument("--data-pipeline", action="store_true")
    p.add_argument("--nn-module", action="store_true")
    p.add_argument("--out", default="benchmark_configs.json")
    args = p.parse_args()

    roots = []
    if args.basic_arch:
        roots += basic_arch_root
    if args.datasets:
        roots += datasets_root
    if args.data_pipeline:
        roots += data_pipeline_root
    if args.nn_module:
        roots += nn_module_root
    if not roots:  # default: everything, deduped, in group order
        seen = set()
        for r in (basic_arch_root + datasets_root + data_pipeline_root
                  + nn_module_root):
            if r not in seen:
                seen.add(r)
                roots.append(r)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    picks = []
    for fam in roots:
        leaf = _first_leaf(os.path.join(here, "configs", fam))
        if leaf:
            picks.append(os.path.relpath(leaf, here))
    with open(args.out, "w") as f:
        json.dump({"models": picks}, f, indent=2)
    print(f"{len(picks)} configs -> {args.out}")
    for c in picks:
        print(" ", c)


if __name__ == "__main__":
    main()
