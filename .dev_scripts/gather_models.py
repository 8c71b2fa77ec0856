#!/usr/bin/env python
"""Collect trained models for release (reference
`.dev_scripts/gather_models.py`): walk benchmark work-dirs, read each run's
final-epoch metrics out of `train.log.json`, strip the optimizer state from
the last epoch checkpoint (content-hash suffix, via `tools/publish_model.py`
logic), copy the config alongside, and emit a model-zoo index json."""

import argparse
import glob
import hashlib
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_LUT = ("bbox_mAP", "segm_mAP", "mAP", "AR@100")


def get_final_epoch(config_path):
    from panoswintransformerobjectdetection_tpu.runtime.config import load_config
    cfg = load_config(config_path)
    return int(cfg.get("runner", {}).get("max_epochs",
                                         cfg.get("total_epochs", 12)))


def get_final_results(log_json_path, epoch):
    """Final train-mode line of the target epoch + its eval metrics."""
    result = {}
    with open(log_json_path) as f:
        for raw in f:
            line = json.loads(raw)
            if line.get("mode") == "train" and line.get("epoch") == epoch:
                result["iter_time_s"] = line.get("time")
            elif line.get("epoch") == epoch and "mode" not in line:
                result.update({k: v for k, v in line.items()
                               if k in RESULTS_LUT or k.endswith("_mAP")
                               or k.startswith("AR@")})
    return result


def process_checkpoint(in_dir, out_dir):
    """Publish an orbax checkpoint dir without optimizer state; suffix with
    a sha256 content hash (reference strips `optimizer` from the .pth)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.abspath(in_dir))
    slim = {"params": state["params"],
            "batch_stats": state.get("batch_stats", {})}
    tmp = os.path.abspath(out_dir) + "_tmp"
    ckptr.save(tmp, slim, force=True)
    sha = hashlib.sha256()
    for root, _, files in os.walk(tmp):
        for fn in sorted(files):
            with open(os.path.join(root, fn), "rb") as f:
                sha.update(f.read())
    final = f"{os.path.abspath(out_dir)}-{sha.hexdigest()[:8]}"
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def main():
    p = argparse.ArgumentParser(description="Gather benchmarked models")
    p.add_argument("root", help="root of benchmark work-dirs")
    p.add_argument("out", help="output dir for the gathered zoo")
    args = p.parse_args()

    logs = sorted(glob.glob(os.path.join(args.root, "*", "train.log.json")))
    index = []
    for log in logs:
        run_dir = os.path.dirname(log)
        stem = os.path.basename(run_dir)
        cfg_candidates = glob.glob(os.path.join("configs", "*", stem + ".py"))
        if not cfg_candidates:
            print(f"skip {stem}: no config found")
            continue
        cfg_path = cfg_candidates[0]
        epoch = get_final_epoch(cfg_path)
        ckpt = os.path.join(run_dir, f"epoch_{epoch}")
        if not os.path.isdir(ckpt):
            print(f"skip {stem}: missing {ckpt}")
            continue
        results = get_final_results(log, epoch)
        model_dir = os.path.join(args.out, stem)
        os.makedirs(model_dir, exist_ok=True)
        final_ckpt = process_checkpoint(ckpt, os.path.join(model_dir, stem))
        shutil.copy(cfg_path, model_dir)
        shutil.copy(log, model_dir)
        index.append({"config": cfg_path, "checkpoint": final_ckpt,
                      "epochs": epoch, "results": results})
        print(f"gathered {stem}: {results}")

    with open(os.path.join(args.out, "model_zoo.json"), "w") as f:
        json.dump(index, f, indent=2)
    print(f"{len(index)} models -> {args.out}/model_zoo.json")


if __name__ == "__main__":
    main()
