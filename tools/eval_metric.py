#!/usr/bin/env python
"""Re-evaluate saved detection results against a dataset (reference
`tools/analysis_tools/eval_metric.py`)."""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("results", help="pickle from tools/test.py --out")
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    ds = build_dataset(cfg["data"]["test"])
    with open(args.results, "rb") as f:
        results = pickle.load(f)
    print(json.dumps(ds.evaluate(results), indent=2))


if __name__ == "__main__":
    main()
