#!/usr/bin/env python
"""Model-zoo batch regression (reference `.dev_scripts/batch_test.py` +
`gather_benchmark_metric.py` role): evaluate a list of (config, checkpoint,
expected-mAP) triples and report pass/fail against a tolerance."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("manifest", help="json: [{config, checkpoint, expected:"
                                    " {bbox_mAP: x}, tol: 0.2}, ...]")
    p.add_argument("--out", default="batch_test_results.json")
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.apis.inference import init_detector
    from panoswintransformerobjectdetection_tpu.apis.test import single_device_test
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    with open(args.manifest) as f:
        entries = json.load(f)

    results = []
    for e in entries:
        cfg = load_config(e["config"])
        if "classes" in cfg:
            cfg["data"]["test"]["classes"] = cfg["classes"]
        det, variables = init_detector(cfg, e.get("checkpoint"))
        ds = build_dataset(cfg["data"]["test"])
        dets = single_device_test(det, variables, ds, progress=True)
        metrics = ds.evaluate(dets)
        ok = all(abs(metrics.get(k, 0.0) - v) <= e.get("tol", 0.002)
                 for k, v in e.get("expected", {}).items())
        results.append({"config": e["config"], "metrics": metrics, "pass": ok})
        print(f"{'PASS' if ok else 'FAIL'} {e['config']}: {metrics}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    sys.exit(0 if all(r["pass"] for r in results) else 1)


if __name__ == "__main__":
    main()
