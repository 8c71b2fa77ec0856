#!/usr/bin/env python
"""Summarize/plot the json training log (reference
`tools/analysis_tools/analyze_logs.py`)."""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("json_log")
    p.add_argument("--keys", nargs="*", default=["loss"])
    p.add_argument("--plot-out", default=None)
    args = p.parse_args()

    rows = []
    with open(args.json_log) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        print("empty log")
        return

    for key in args.keys:
        vals = [(i, r[key]) for i, r in enumerate(rows) if key in r]
        if not vals:
            print(f"{key}: not found")
            continue
        ys = [v for _, v in vals]
        print(f"{key}: n={len(ys)} first={ys[0]:.4f} last={ys[-1]:.4f} "
              f"min={min(ys):.4f} max={max(ys):.4f}")

    if args.plot_out:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            for key in args.keys:
                ys = [r[key] for r in rows if key in r]
                ax.plot(ys, label=key)
            ax.legend()
            ax.set_xlabel("log step")
            fig.savefig(args.plot_out)
            print(f"saved {args.plot_out}")
        except ImportError:
            print("matplotlib unavailable; skipped plot")


if __name__ == "__main__":
    main()
