#!/usr/bin/env python
"""Corruption-robustness benchmark (reference
`tools/analysis_tools/test_robustness.py` analogue).

Evaluates a checkpoint under the corruption suite at several severities
and reports per-corruption mAP plus mPC (mean performance under
corruption) relative to clean mAP.

    python tools/analysis_tools/test_robustness.py <cfg> <ckpt> \
        --corruptions gaussian_noise motion_blur --severities 1 3 5
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--corruptions", nargs="*", default=["benchmark"])
    p.add_argument("--severities", nargs="*", type=int, default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--eval", nargs="*", default=["bbox"])
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.apis.inference import init_detector
    from panoswintransformerobjectdetection_tpu.apis.test import single_device_test
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset
    from panoswintransformerobjectdetection_tpu.data.corruptions import (
        BENCHMARK_CORRUPTIONS, Corrupt)

    corruptions = list(args.corruptions)
    if corruptions == ["benchmark"]:
        corruptions = list(BENCHMARK_CORRUPTIONS)

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    det, variables = init_detector(cfg, args.checkpoint)
    with_masks = "segm" in args.eval

    def run_one(corr, sev):
        dataset = build_dataset(cfg["data"]["test"])
        if sev > 0 and dataset.pipeline is not None:
            # corrupt right after image loading (reference inserts at
            # pipeline position 1)
            dataset.pipeline.transforms.insert(1, Corrupt(corr, sev))
        results = single_device_test(det, variables, dataset,
                                     batch_size=args.batch_size,
                                     with_masks=with_masks)
        return dataset.evaluate(results, metric=args.eval)

    table = {}
    if 0 in args.severities:  # severity 0 == clean baseline, evaluated once
        table["clean"] = run_one(None, 0)
        print("clean", json.dumps(table["clean"]))
    for corr in corruptions:
        for sev in args.severities:
            if sev == 0:
                continue
            key = f"{corr}@{sev}"
            table[key] = run_one(corr, sev)
            print(key, json.dumps(table[key]))
    clean = table.get("clean", {}).get("bbox_mAP")
    corrupted = [m["bbox_mAP"] for k, m in table.items() if k != "clean"
                 and "bbox_mAP" in m]
    summary = {"mPC": sum(corrupted) / len(corrupted) if corrupted else None,
               "clean_mAP": clean}
    if clean and summary["mPC"] is not None:
        summary["rPC"] = summary["mPC"] / clean if clean > 0 else None
    print("summary", json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"table": table, "summary": summary}, f, indent=2)
    return table, summary


if __name__ == "__main__":
    main()
