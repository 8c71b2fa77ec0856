#!/usr/bin/env python
"""Resolve and pretty-print a config with its _base_ inheritance
(reference `tools/misc/print_config.py`)."""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    args = p.parse_args()
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    cfg = load_config(args.config)
    print(json.dumps(cfg, indent=2, default=repr))


if __name__ == "__main__":
    main()
