#!/usr/bin/env python
"""Partitioned model-zoo regression testing (reference
`.dev_scripts/batch_test.py`): split a `tools/batch_test.py` manifest into
round-robin partitions so several hosts can each evaluate a slice of the
zoo, then run this host's slice."""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def main():
    p = argparse.ArgumentParser(description="Batch-test a model-zoo slice")
    p.add_argument("manifest", help="json list for tools/batch_test.py")
    p.add_argument("--partition-index", type=int, default=0)
    p.add_argument("--partition-count", type=int, default=1)
    p.add_argument("--out", default="batch_test_results.json")
    p.add_argument("--dry-run", action="store_true",
                   help="print the slice without evaluating")
    args = p.parse_args()

    with open(args.manifest) as f:
        entries = json.load(f)
    mine = entries[args.partition_index::args.partition_count]
    print(f"partition {args.partition_index}/{args.partition_count}: "
          f"{len(mine)}/{len(entries)} entries")
    if args.dry_run:
        for e in mine:
            print(" ", e["config"])
        return

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as tf:
        json.dump(mine, tf)
        slice_path = tf.name
    rc = subprocess.call([sys.executable,
                          os.path.join(here, "tools", "batch_test.py"),
                          slice_path, "--out", args.out])
    os.unlink(slice_path)
    sys.exit(rc)


if __name__ == "__main__":
    main()
