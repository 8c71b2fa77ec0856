#!/usr/bin/env python
"""Train-step stage profile on the real chip (VERDICT r3 weak #3).

Breaks the full PanoSwin-T Faster R-CNN train step (fwd + bwd + AdamW)
into stages:

  1. full jitted train step (B=2, 512x1024 bf16) — the bench.py number
  2. loss forward only (no grad)
  3. backbone-only fwd (train mode, live BN) / fwd+bwd / fwd+bwd w/ remat
  4. stem fwd+bwd with live BN vs inference-folded
  5. optimizer (AdamW + paramwise masks) update alone

Run serialized with other TPU work (one chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def hard_sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from __graft_entry__ import _flagship
    from panoswintransformerobjectdetection_tpu.runtime import (
        create_train_state, make_train_step, make_optimizer)
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        PanoSwinTransformer)

    B, H, W, G = 2, 512, 1024, 32
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    r = np.random.default_rng(0)
    images = jnp.asarray(r.random((B, H, W, 3)), jnp.float32)
    batch = {
        "images": images,
        "img_shapes": jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1)),
        "gt_boxes": jnp.asarray(np.stack([np.stack(
            [np.linspace(0, 400, G), np.linspace(0, 200, G),
             np.linspace(100, 500, G), np.linspace(80, 280, G)], -1)] * B),
            jnp.float32),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
    }
    rng = jax.random.PRNGKey(0)

    det = _flagship(compute_dtype=dtype)
    tx = make_optimizer(det.init(rng, images[:1])["params"], base_lr=1e-4)
    state = create_train_state(det, rng, jnp.zeros((1, H, W, 3), jnp.float32),
                               tx)

    # 1. full step
    step = jax.jit(make_train_step(det))
    t = timeit(lambda s: step(s, batch, rng)[1]["loss"], state)
    print(f"full train step (B={B}): {t:.1f} ms  "
          f"({B / t * 1000:.2f} img/s/chip)")

    # 2. forward-only loss
    def fwd_loss(params, bs):
        out, _ = det.apply({"params": params, "batch_stats": bs},
                           batch["images"], batch["img_shapes"],
                           batch["gt_boxes"], batch["gt_labels"],
                           batch["gt_valid"], method=det.forward_train,
                           rngs={"sampler": rng, "droppath": rng},
                           mutable=["batch_stats"])
        return sum(v for k, v in out.items() if "loss" in k)
    f = jax.jit(fwd_loss)
    print(f"loss forward only: {timeit(f, state.params, state.batch_stats):.1f} ms")

    # 3. backbone-only: train-mode fwd / fwd+bwd / fwd+bwd remat
    for remat in (False, True):
        bb = PanoSwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                                 num_heads=(3, 6, 12, 24), window_size=7,
                                 ape=True, drop_path_rate=0.0,
                                 use_checkpoint=remat, dtype=dtype)
        bv = bb.init(rng, images[:1])
        if not remat:
            fwd = jax.jit(lambda p, bs: bb.apply(
                {"params": p, "batch_stats": bs}, images, train=True,
                rngs={"droppath": rng}, mutable=["batch_stats"])[0])
            print(f"backbone fwd (train, live BN): "
                  f"{timeit(fwd, bv['params'], bv.get('batch_stats', {})):.1f} ms")

        def bb_loss(p, bs, bb=bb):
            outs, _ = bb.apply({"params": p, "batch_stats": bs}, images,
                               train=True, rngs={"droppath": rng},
                               mutable=["batch_stats"])
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        g = jax.jit(jax.grad(bb_loss))
        t = timeit(lambda p, bs: jax.tree_util.tree_leaves(g(p, bs))[0],
                   bv["params"], bv.get("batch_stats", {}))
        print(f"backbone fwd+bwd (remat={remat}): {t:.1f} ms")

    # 5. optimizer update alone
    grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    opt = jax.jit(lambda g, o, p: state.tx.update(g, o, p)[0])
    print(f"AdamW update alone: "
          f"{timeit(opt, grads, state.opt_state, state.params):.1f} ms")


if __name__ == "__main__":
    main()
