"""Optimizers and LR schedules.

Reproduces the reference's AdamW recipe
(`configs/swin/faster_rcnn_panoswin_..._streetwin.py:139-145`): lr 1e-4,
betas (0.9, 0.999), weight_decay 0.05, with decay_mult=0 for the
alpha/beta sphere-bias tables, absolute position embeddings, all norm
params, and biases; linear warmup then stepwise 0.1x decay.  Gradient
accumulation = optax.MultiSteps (reference `DistOptimizerHook.update_interval`,
`mmdet/utils/optimizer.py:12`).  Mixed precision on TPU is bf16 activations
— no loss scaling needed (replaces apex O1, SURVEY.md 2.9).
"""

from typing import Sequence

import jax.numpy as jnp
import optax

NO_DECAY_KEYS = ("bias", "scale", "alpha_table", "beta_table",
                 "relative_position_bias_table", "absolute_pos_embed",
                 "ln", "norm", "bn")


def no_decay_mask(params):
    """Pytree of bools: True where weight decay applies."""
    def decide(path, _):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        last = names[-1].lower() if names else ""
        joined = "/".join(n.lower() for n in names)
        if last in ("bias", "scale"):
            return False
        for k in NO_DECAY_KEYS:
            if k in joined.split("/")[-2:] or last.startswith(k):
                return False
        # norm layers by module name
        if any(n.lower().startswith(("norm", "ln", "bn")) for n in names[:-1]):
            return False
        return True
    import jax
    return jax.tree_util.tree_map_with_path(decide, params)


def warmup_step_schedule(base_lr: float, warmup_iters: int = 500,
                         warmup_ratio: float = 0.001,
                         decay_steps: Sequence[int] = (),
                         gamma: float = 0.1):
    """Linear warmup -> piecewise-constant step decay (mmcv StepLrUpdater)."""
    def fn(step):
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) *
                          jnp.minimum(step, warmup_iters) / max(warmup_iters, 1))
        decay = base_lr
        for s in decay_steps:
            decay = jnp.where(step >= s, decay * gamma, decay)
        return jnp.where(step < warmup_iters, warm, decay)
    return fn


def make_optimizer(params, base_lr: float = 1e-4, weight_decay: float = 0.05,
                   betas=(0.9, 0.999), warmup_iters: int = 500,
                   warmup_ratio: float = 0.001,
                   decay_steps: Sequence[int] = (),
                   grad_clip: float = 0.0,
                   accumulate_steps: int = 1) -> optax.GradientTransformation:
    sched = warmup_step_schedule(base_lr, warmup_iters, warmup_ratio, decay_steps)
    chain = []
    if grad_clip > 0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay, mask=no_decay_mask(params)))
    chain.append(optax.scale_by_learning_rate(sched))
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
