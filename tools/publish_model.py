#!/usr/bin/env python
"""Strip a training checkpoint for release (reference
`tools/model_converters/publish_model.py`): drop optimizer state, keep
params+batch_stats, suffix the output with a content hash."""

import argparse
import hashlib
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt")
    p.add_argument("out_prefix")
    args = p.parse_args()

    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.abspath(args.in_ckpt))
    slim = {"params": state["params"],
            "batch_stats": state.get("batch_stats", {})}

    tmp = os.path.abspath(args.out_prefix + "_tmp")
    ckptr.save(tmp, slim, force=True)

    sha = hashlib.sha256()
    for root, _, files in os.walk(tmp):
        for fn in sorted(files):
            with open(os.path.join(root, fn), "rb") as f:
                sha.update(f.read())
    digest = sha.hexdigest()[:8]
    final = os.path.abspath(f"{args.out_prefix}-{digest}")
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    print(f"published {final}")


if __name__ == "__main__":
    main()
