"""Training hooks (`mmcv.runner` hook system role).

The train loop (`apis/train.py`) invokes hooks at epoch/iter boundaries;
built-in behaviors (text+json logging, checkpointing, eval) are themselves
hooks, so users can extend cadence-based behavior the same way the
reference registers `TextLoggerHook` / `CheckpointHook` / `EvalHook`.
"""

from typing import Any, Dict, Optional


class Hook:
    def before_train(self, ctx: Dict[str, Any]):
        pass

    def before_epoch(self, ctx: Dict[str, Any]):
        pass

    def after_iter(self, ctx: Dict[str, Any]):
        pass

    def after_epoch(self, ctx: Dict[str, Any]):
        pass

    def after_train(self, ctx: Dict[str, Any]):
        pass


class LrRecordHook(Hook):
    """Record the scheduled lr into metrics each log step."""

    def __init__(self, schedule):
        self.schedule = schedule

    def after_iter(self, ctx):
        if ctx.get("metrics") is not None:
            ctx["metrics"]["lr"] = float(self.schedule(ctx["step"]))


class EmptyCacheHook(Hook):
    """`EmptyCacheHook` analogue: on TPU there is no allocator cache to
    drop, but a periodic live-buffer report helps catch leaks."""

    def __init__(self, interval: int = 1000):
        self.interval = interval

    def after_iter(self, ctx):
        if ctx["step"] % self.interval == 0:
            import jax
            n = sum(1 for _ in jax.live_arrays())
            ctx.setdefault("logs", []).append(f"live arrays: {n}")


class NumClassCheckHook(Hook):
    """`mmdet/datasets/utils.py NumClassCheckHook` role: before training,
    verify the detector head's `num_classes` matches the dataset's CLASSES
    length (the single most common config mistake when swapping datasets).
    Expects ctx keys "model" and "dataset" (train loop provides them)."""

    def before_train(self, ctx):
        det = ctx.get("model")
        ds = ctx.get("dataset")
        classes = getattr(ds, "CLASSES", None)
        nc = getattr(det, "num_classes", None)
        if classes is None or nc is None:
            return
        if len(classes) != nc:
            import logging
            logging.getLogger("panoswin_tpu").warning(
                "model num_classes (%d) != len(dataset.CLASSES) (%d): "
                "fix model.num_classes or pass classes= to the dataset",
                nc, len(classes))
