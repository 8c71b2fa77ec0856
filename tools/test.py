#!/usr/bin/env python
"""Evaluate a checkpoint (reference `tools/test.py:113` analogue).

    python tools/test.py <config> <checkpoint> --eval bbox segm
    python tools/test.py <config> <checkpoint> --eval bbox --tta

`--eval` selects the metrics routed through the COCOeval-exact evaluator
(`core/cocoeval.py`): bbox / segm / proposal.  `--tta` runs the
MultiScaleFlipAug-style test-time augmentation (`apis/tta.py`, matching
`mmdet/datasets/pipelines/test_time_aug.py:9` + `aug_test`).  Under
`jax.distributed` (process_count > 1) the eval shards images across hosts
and host 0 reports (`multi_gpu_test` role).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("--eval", nargs="*", default=["bbox"],
                   choices=["bbox", "segm", "proposal"])
    p.add_argument("--tta", action="store_true",
                   help="multi-scale + flip test-time augmentation")
    p.add_argument("--classwise", action="store_true")
    p.add_argument("--out", default=None)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--launcher", choices=["none", "jax"], default="none",
                   help="'jax' initializes jax.distributed for multi-host "
                        "eval (dist_test.sh role)")
    args = p.parse_args(argv)

    import jax
    if args.launcher == "jax":
        jax.distributed.initialize()
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    from panoswintransformerobjectdetection_tpu.apis.inference import (
        init_detector)
    from panoswintransformerobjectdetection_tpu.apis.test import (
        single_device_test, multi_host_test)
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    if "classes" in cfg:
        cfg["data"]["test"]["classes"] = cfg["classes"]
    det, variables = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(cfg["data"]["test"])
    with_masks = "segm" in args.eval

    if args.tta:
        from panoswintransformerobjectdetection_tpu.apis.tta import (
            aug_test_detector)
        from panoswintransformerobjectdetection_tpu.data.transforms import (
            LoadImageFromFile)
        assert not with_masks, "--tta supports bbox eval only"
        loader = LoadImageFromFile()
        tta_cfg = cfg.get("tta", {})
        results = []
        for i in range(len(dataset)):
            rec = dataset.records[i]
            r = loader({"img_path": os.path.join(dataset.img_prefix,
                                                 rec["filename"]),
                        "img_info": rec})
            results.append(aug_test_detector(
                det, variables, r["img"],
                scales=tuple(tta_cfg.get("scales", ((800, 1333),))),
                flip=tta_cfg.get("flip", True)))
    elif jax.process_count() > 1:
        results = multi_host_test(det, variables, dataset,
                                  batch_size=args.batch_size)
        if results is None:  # non-zero host
            return
    else:
        results = single_device_test(det, variables, dataset,
                                     batch_size=args.batch_size,
                                     with_masks=with_masks, progress=True)

    metrics = dataset.evaluate(results, metric=args.eval,
                               classwise=args.classwise)
    # classwise AP is NaN for classes with no gt; bare NaN is not valid
    # JSON, so emit null there
    import math
    printable = {k: (None if isinstance(v, float) and math.isnan(v) else v)
                 for k, v in metrics.items()}
    print(json.dumps(printable, indent=2))
    if args.out:
        import pickle
        with open(args.out, "wb") as f:
            pickle.dump(results, f)
    return metrics


if __name__ == "__main__":
    main()
