#!/usr/bin/env python
"""Evaluate a checkpoint (reference `tools/test.py` analogue).

    python tools/test.py <config> <checkpoint> --eval bbox
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", nargs="*", default=["bbox"])
    p.add_argument("--out", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.apis.inference import (
        init_detector)
    from panoswintransformerobjectdetection_tpu.apis.test import single_device_test
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    det, variables = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(cfg["data"]["test"])
    results = single_device_test(det, variables, dataset,
                                 batch_size=args.batch_size, progress=True)
    metrics = dataset.evaluate(results)
    print(json.dumps(metrics, indent=2))
    if args.out:
        import pickle
        with open(args.out, "wb") as f:
            pickle.dump(results, f)


if __name__ == "__main__":
    main()
