#!/usr/bin/env python
"""Train a detector from a config file (reference `tools/train.py` analogue).

    python tools/train.py configs/panoswin/faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py \
        --work-dir work_dirs/streetwin
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--launcher", choices=["none", "jax"], default="none",
                   help="'jax': initialize jax.distributed for multi-host"
                        " TPU pods (the init_dist role)")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    if args.launcher == "jax":
        import jax
        jax.distributed.initialize()
    from panoswintransformerobjectdetection_tpu.runtime.config import (
        load_config, set_by_dotted)
    from panoswintransformerobjectdetection_tpu.apis.inference import (
        build_detector_from_cfg)
    from panoswintransformerobjectdetection_tpu.apis.train import train_detector
    from panoswintransformerobjectdetection_tpu.apis.test import single_device_test
    from panoswintransformerobjectdetection_tpu.data.builder import build_dataset

    cfg = load_config(args.config)
    for opt in args.cfg_options:
        k, v = opt.split("=", 1)
        try:
            import ast
            v = ast.literal_eval(v)
        except Exception:
            pass
        set_by_dotted(cfg, k, v)

    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])

    if "classes" in cfg:
        for split in ("train", "val", "test"):
            if cfg["data"].get(split):
                cfg["data"][split]["classes"] = cfg["classes"]

    det = build_detector_from_cfg(cfg)
    dataset = build_dataset(cfg["data"]["train"])

    eval_fn = None
    if cfg["data"].get("val"):
        val_ds = build_dataset(cfg["data"]["val"])

        def eval_fn(state):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            dets = single_device_test(det, variables, val_ds)
            return val_ds.evaluate(dets)

    sched = cfg.get("lr_config", {})
    opt = cfg.get("optimizer", {})
    # runner.max_epochs (2.x dialect) vs legacy top-level total_epochs
    # (1.x): like the reference (`mmdet/apis/train.py:113-114`), a config
    # carrying BOTH with different values is an error, never a silent pick.
    runner_epochs = cfg.get("runner", {}).get("max_epochs")
    legacy_epochs = cfg.get("total_epochs")
    if (runner_epochs is not None and legacy_epochs is not None
            and runner_epochs != legacy_epochs):
        raise ValueError(
            f"runner.max_epochs ({runner_epochs}) != total_epochs "
            f"({legacy_epochs}); set only one (a child config overriding a "
            "base schedule must override runner=dict(max_epochs=...))")
    total_epochs = runner_epochs if runner_epochs is not None else (
        legacy_epochs if legacy_epochs is not None else 12)
    train_detector(
        det, dataset,
        work_dir=work_dir,
        total_epochs=total_epochs,
        batch_size=cfg.get("data", {}).get("samples_per_gpu", 2),
        num_workers=cfg.get("data", {}).get("workers_per_gpu", 2),
        base_lr=opt.get("lr", 1e-4),
        weight_decay=opt.get("weight_decay", 0.05),
        warmup_iters=sched.get("warmup_iters", 500),
        decay_epochs=tuple(sched.get("step", (8, 11))),
        checkpoint_interval=cfg.get("checkpoint_config", {}).get("interval", 1),
        log_interval=cfg.get("log_config", {}).get("interval", 50),
        eval_fn=eval_fn,
        seed=args.seed,
        resume_from=args.resume_from,
        load_from=cfg.get("load_from"),
        pretrained=cfg.get("model", {}).get("pretrained"),
    )


if __name__ == "__main__":
    main()
