"""Training API (`mmdet/apis/train.py:42 train_detector` analogue).

Orchestrates: loader -> sharded pjit train step -> periodic logging /
checkpointing / eval — the role of mmcv's EpochBasedRunner + hook system,
expressed as a plain loop (the step itself is one fused XLA program; hooks
become in-loop callbacks).
"""

import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger("panoswin_tpu")


def set_random_seed(seed: int, deterministic: bool = False):
    """`mmdet/apis/train.py set_random_seed` analogue.

    Seeds the host-side RNGs (python `random`, numpy) used by the data
    pipeline, and returns `jax.random.PRNGKey(seed)` for the device side.
    `deterministic` is accepted for signature parity but is a no-op: XLA
    on TPU is deterministic by default (the reference flips cudnn knobs).
    """
    import random as _random
    import jax
    _random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def _apply_init_weights(det, state, load_from=None, pretrained=None):
    """Weight initialization before training (reference semantics:
    cfg.load_from = whole-detector weights, model.pretrained = backbone
    init, `mmcv_custom/checkpoint.py:240-300` multi-source loading)."""
    if load_from:
        from .inference import load_weights
        nv = load_weights(det, {"params": state.params,
                                "batch_stats": state.batch_stats}, load_from)
        logger.info("load_from %s", load_from)
        return state.replace(
            params=nv["params"],
            batch_stats=nv.get("batch_stats", state.batch_stats))
    if not pretrained:
        return state
    from ..runtime import checkpoint as ck
    bb = dict(det.backbone)
    t = bb.get("type", "")
    sd = ck.load_torch_state_dict(pretrained)
    stats = None
    if "Pano" in t:
        params, stats = ck.convert_panoswin_backbone(
            sd, tuple(bb.get("depths", (2, 2, 6, 2))),
            bb.get("window_size", 7))
    elif "Swin" in t:
        params, stats = ck.convert_swin_backbone(
            sd, tuple(bb.get("depths", (2, 2, 6, 2))),
            bb.get("window_size", 7))
    elif t == "RegNet":
        if "model_state" in sd:
            sd = sd["model_state"]
        params, stats = ck.convert_regnet_backbone(
            sd, bb.get("arch", "regnetx_3.2gf"))
    elif "ResNe" in t:  # ResNet / ResNeXt
        params, stats = ck.convert_resnet_backbone(sd, bb.get("depth", 50))
    else:
        raise ValueError(f"pretrained init not supported for backbone {t!r}")
    new_params = dict(state.params)
    new_params["backbone_m"] = params
    new_stats = dict(state.batch_stats or {})
    if stats:
        new_stats["backbone_m"] = stats
    logger.info("initialized %s backbone from %s", t, pretrained)
    return state.replace(params=new_params, batch_stats=new_stats)


def train_detector(det, dataset, *, work_dir: str, total_epochs: int = 12,
                   batch_size: int = 2, base_lr: float = 1e-4,
                   weight_decay: float = 0.05, warmup_iters: int = 500,
                   decay_epochs=(8, 11), grad_clip: float = 0.0,
                   accumulate_steps: int = 1, max_gt: int = 100,
                   log_interval: int = 50, checkpoint_interval: int = 1,
                   eval_fn: Optional[Callable] = None, seed: int = 0,
                   resume_from: Optional[str] = None, hooks=None,
                   num_workers: int = 2, buckets=None, pad_to=None,
                   load_from: Optional[str] = None,
                   pretrained: Optional[str] = None):
    """Returns the final TrainState.

    `buckets`/`pad_to` pass through to DetDataLoader; one of them is
    required for multi-host runs (process_count > 1) so every process pads
    to identical global batch shapes each step."""
    import jax
    import jax.numpy as jnp
    from ..data.loader import DetDataLoader
    from ..parallel import make_mesh, shard_batch
    from ..runtime import create_train_state, make_train_step, make_optimizer
    from ..runtime.train import jit_train_step, place_state
    from ..runtime.checkpoint import save_checkpoint, load_checkpoint

    # multi-host layout (DDP + DistributedGroupSampler semantics,
    # `mmdet/apis/train.py:94-100`, `datasets/builder.py:75`): the mesh
    # spans the GLOBAL device set, every host feeds its own dataset shard,
    # and only process 0 writes logs/checkpoints.
    nproc = jax.process_count()
    pid = jax.process_index()
    is_main = pid == 0

    os.makedirs(work_dir, exist_ok=True)
    if is_main:
        fh = logging.FileHandler(os.path.join(work_dir, "train.log"))
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
        logger.setLevel(logging.INFO)
        json_log = open(os.path.join(work_dir, "train.log.json"), "a")

    # use as many devices as divide the global batch
    devices = jax.devices()
    assert batch_size % nproc == 0, (batch_size, nproc)
    if nproc > 1:
        # the mesh must span EVERY process (each feeds its local shard via
        # make_array_from_process_local_data); pick an equal per-process
        # device count k that divides the local batch
        local_batch = batch_size // nproc
        per_proc = {}
        for d in devices:
            per_proc.setdefault(d.process_index, []).append(d)
        n_local = min(len(v) for v in per_proc.values())
        k = max(kk for kk in range(1, n_local + 1) if local_batch % kk == 0)
        devices = [d for p in sorted(per_proc) for d in per_proc[p][:k]]
        mesh = make_mesh(devices)
    else:
        n_use = max(d for d in range(1, len(devices) + 1)
                    if batch_size % d == 0)
        mesh = make_mesh(devices[:n_use])
    loader = DetDataLoader(dataset, batch_size=batch_size // nproc,
                           max_gt=max_gt, seed=seed,
                           num_shards=nproc, shard_id=pid,
                           num_workers=num_workers,
                           buckets=buckets, pad_to=pad_to)
    steps_per_epoch = max(len(loader), 1)
    decay_steps = tuple(int(e * steps_per_epoch) for e in decay_epochs)

    sample = jnp.zeros((1, 64, 128, 3), jnp.float32)
    init_params = det.init(jax.random.PRNGKey(seed), sample)["params"]
    tx = make_optimizer(init_params, base_lr=base_lr, weight_decay=weight_decay,
                        warmup_iters=warmup_iters, decay_steps=decay_steps,
                        grad_clip=grad_clip, accumulate_steps=accumulate_steps)
    state = create_train_state(det, jax.random.PRNGKey(seed), sample, tx)
    if not resume_from:
        state = _apply_init_weights(det, state, load_from=load_from,
                                    pretrained=pretrained)
    start_epoch = 0
    if resume_from:
        state = load_checkpoint(resume_from, state)
        start_epoch = int(state.step) // steps_per_epoch
        logger.info("resumed from %s at step %d", resume_from, int(state.step))
    state = place_state(mesh, state)
    step_fn = jit_train_step(make_train_step(det), mesh)
    rng = jax.random.PRNGKey(seed + 1)

    from ..runtime.hooks import NumClassCheckHook
    hooks = [NumClassCheckHook()] + list(hooks or [])
    ctx = {"work_dir": work_dir, "epoch": start_epoch,
           "step": int(state.step), "model": det, "dataset": dataset}
    for h in hooks:
        h.before_train(ctx)

    with mesh:
        for epoch in range(start_epoch, total_epochs):
            ctx["epoch"] = epoch
            for h in hooks:
                h.before_epoch(ctx)
            t0 = time.time()
            for i, batch in enumerate(loader):
                keys = ["images", "img_shapes", "gt_boxes", "gt_labels",
                        "gt_valid"]
                for opt in ("gt_masks", "pano_ratio_v"):
                    if opt in batch:
                        keys.append(opt)
                b = shard_batch(mesh, {k: batch[k] for k in keys})
                state, metrics = step_fn(state, b, rng)
                ctx["step"] = int(state.step)
                if hooks:
                    host_metrics = {k: float(v) for k, v in
                                    jax.device_get(metrics).items()}
                    ctx["metrics"] = host_metrics
                    for h in hooks:
                        h.after_iter(ctx)
                    for line in ctx.pop("logs", []):
                        logger.info(line)
                if (i + 1) % log_interval == 0 and is_main:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    m.update(epoch=epoch + 1, iter=i + 1,
                             time=round((time.time() - t0) / (i + 1), 3))
                    logger.info("Epoch [%d][%d/%d] %s", epoch + 1, i + 1,
                                steps_per_epoch,
                                " ".join(f"{k}: {v:.4f}" for k, v in m.items()
                                         if isinstance(v, float)))
                    json_log.write(json.dumps(m) + "\n")
                    json_log.flush()
            if (epoch + 1) % checkpoint_interval == 0:
                # orbax saves are COLLECTIVE under jax.distributed: every
                # process must enter the save (orbax writes replicated
                # values from the primary host only, but all processes
                # must reach its sync barriers — a process-0-only call
                # desyncs the collective stream and corrupts later
                # allgathers).  Reference's rank-0-only torch.save
                # (`mmcv` CheckpointHook) does not transfer to JAX.
                path = os.path.join(work_dir, f"epoch_{epoch + 1}")
                save_checkpoint(os.path.abspath(path), state)
                if is_main:
                    latest = os.path.join(work_dir, "latest")
                    if os.path.islink(latest):
                        os.unlink(latest)
                    if not os.path.exists(latest):
                        os.symlink(os.path.abspath(path), latest)
            if eval_fn is not None:
                metrics = eval_fn(state)
                if is_main and metrics is not None:
                    logger.info("Eval epoch %d: %s", epoch + 1, metrics)
                    json_log.write(json.dumps({"epoch": epoch + 1, **metrics}) + "\n")
                    json_log.flush()
            for h in hooks:
                h.after_epoch(ctx)
    for h in hooks:
        h.after_train(ctx)
    return state
