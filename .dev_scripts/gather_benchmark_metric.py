#!/usr/bin/env python
"""Aggregate regression-training metrics (reference
`.dev_scripts/gather_benchmark_metric.py`): for every config picked by
`benchmark_filter.py`, pull the final-epoch eval numbers from its
work-dir's `train.log.json` and report them side by side."""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gather_models import get_final_epoch, get_final_results  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="Gather benchmark metrics")
    p.add_argument("root", help="root path of benchmark work-dirs")
    p.add_argument("benchmark_json", help="output of benchmark_filter.py")
    p.add_argument("--out", default=None, help="json output path")
    args = p.parse_args()

    with open(args.benchmark_json) as f:
        models = json.load(f)["models"]

    table = {}
    for cfg in models:
        stem = os.path.splitext(os.path.basename(cfg))[0]
        run_dir = os.path.join(args.root, stem)
        logs = sorted(glob.glob(os.path.join(run_dir, "train.log.json")))
        if not logs:
            table[stem] = {"status": "missing log"}
            continue
        epoch = get_final_epoch(cfg)
        results = get_final_results(logs[-1], epoch)
        table[stem] = results if results else {"status": f"no epoch {epoch}"}
        print(f"{stem}: {table[stem]}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
