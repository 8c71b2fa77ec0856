"""SPMD train state + step.

One jitted function = one optimizer step (the reference's
`train_step` -> DDP backward -> `DistOptimizerHook.after_train_iter` chain
collapses into pjit with sharding annotations: gradients are averaged
across the data axis by XLA-inserted collectives).
"""

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import data_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def create_train_state(detector, rng, sample_images, tx) -> TrainState:
    variables = detector.init(rng, sample_images)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)


def make_train_step(detector, loss_keys: Optional[tuple] = None) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: dict(images (B,H,W,3), img_shapes (B,2), gt_boxes (B,G,4),
    gt_labels (B,G), gt_valid (B,G)).  Pure — jit/pjit it with batch dim-0
    sharded over the data axis and state replicated; XLA then inserts the
    gradient all-reduce.
    """
    import inspect
    sig_params = inspect.signature(detector.forward_train).parameters

    def loss_fn(params, batch_stats, batch, rng):
        r1, r2 = jax.random.split(jax.random.fold_in(rng, 0))
        extra = {}
        if "gt_masks" in sig_params and batch.get("gt_masks") is not None:
            extra["gt_masks"] = batch["gt_masks"]
        if "pano_ratio_v" in sig_params and batch.get("pano_ratio_v") is not None:
            extra["pano_ratio_v"] = batch["pano_ratio_v"]
        out, updates = detector.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["img_shapes"], batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"],
            method=detector.forward_train,
            rngs={"sampler": r1, "droppath": r2},
            mutable=["batch_stats"], **extra)
        keys = loss_keys or tuple(k for k in out if "loss" in k)
        total = sum(out[k] for k in keys)
        return total, (out, updates.get("batch_stats", batch_stats))

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt), metrics

    return step


def jit_train_step(step_fn, mesh):
    """jit the step; shard the batch dim-0 over `data`, replicate the state.

    Computation-follows-data: callers place the batch with
    `parallel.shard_batch(mesh, batch)` and the state with
    `place_state(mesh, state)`; jit propagates those shardings and inserts
    the gradient all-reduce over ICI.
    """
    return jax.jit(step_fn, donate_argnums=(0,))


def place_state(mesh, state: TrainState) -> TrainState:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
