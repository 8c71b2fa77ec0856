#!/usr/bin/env python
"""Summarize corruption-robustness results (reference
`tools/analysis_tools/robustness_eval.py` analogue).

Consumes the JSON written by `test_robustness.py --out` and prints the
corruption-benchmark summary: P (clean performance), mPC (mean
performance under corruption, averaged over corruptions x severities)
and rPC (relative mPC / P) for each recorded metric.

    python tools/analysis_tools/robustness_eval.py results.json \
        --task bbox --prints P mPC rPC
"""

import argparse
import json
from collections import defaultdict

METRIC_KEYS = ("mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l",
               "AR@1", "AR@10", "AR@100")


def aggregate(table, task="bbox"):
    """-> (clean: {metric: v}, per_corruption: {corr: {metric: mean over
    severities}}, mpc: {metric: mean over corruptions})."""
    clean = {k: v for k, v in table.get("clean", {}).items()
             if k.startswith(task) and isinstance(v, (int, float))}
    by_corr = defaultdict(lambda: defaultdict(list))
    for key, metrics in table.items():
        if key == "clean" or "@" not in key:
            continue
        corr = key.rsplit("@", 1)[0]
        for k, v in metrics.items():
            if k.startswith(task) and isinstance(v, (int, float)) and v >= 0:
                by_corr[corr][k].append(v)
    per_corr = {c: {k: sum(vs) / len(vs) for k, vs in m.items()}
                for c, m in by_corr.items()}
    mpc = defaultdict(list)
    for m in per_corr.values():
        for k, v in m.items():
            mpc[k].append(v)
    mpc = {k: sum(vs) / len(vs) for k, vs in mpc.items()}
    return clean, per_corr, mpc


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("filename", help="JSON from test_robustness.py --out")
    p.add_argument("--task", default="bbox", choices=["bbox", "segm"])
    p.add_argument("--prints", nargs="*", default=["P", "mPC", "rPC"],
                   choices=["P", "mPC", "rPC"])
    args = p.parse_args(argv)

    with open(args.filename) as f:
        data = json.load(f)
    table = data.get("table", data)
    clean, per_corr, mpc = aggregate(table, args.task)

    print(f"corruptions evaluated: {sorted(per_corr)}")
    for corr in sorted(per_corr):
        row = ", ".join(f"{k}={v:.3f}" for k, v in sorted(per_corr[corr].items()))
        print(f"  {corr}: {row}")
    for metric in sorted(set(clean) | set(mpc)):
        p_ = clean.get(metric)
        m_ = mpc.get(metric)
        parts = []
        if "P" in args.prints and p_ is not None:
            parts.append(f"P={p_:.3f}")
        if "mPC" in args.prints and m_ is not None:
            parts.append(f"mPC={m_:.3f}")
        if "rPC" in args.prints and p_ and m_ is not None:
            parts.append(f"rPC={m_ / p_:.1%}")
        if parts:
            print(f"{metric}: " + "  ".join(parts))
    return clean, per_corr, mpc


if __name__ == "__main__":
    main()
