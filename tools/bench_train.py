#!/usr/bin/env python
"""Training-step throughput on the current chip (flagship PanoSwin-T
Faster R-CNN, bf16 compute, full loss incl target assembly)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
from panoswintransformerobjectdetection_tpu.utils.profiling import hard_sync
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def main():
    from __graft_entry__ import _flagship
    from panoswintransformerobjectdetection_tpu.runtime import (
        create_train_state, make_train_step, make_optimizer)

    B, H, W, G = 2, 512, 1024, 32
    det = _flagship(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((B, H, W, 3)), jnp.float32),
        "img_shapes": jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1)),
        "gt_boxes": jnp.asarray(
            np.stack([np.stack([np.linspace(0, 400, G), np.linspace(0, 200, G),
                                np.linspace(100, 500, G), np.linspace(80, 280, G)],
                               -1)] * B), jnp.float32),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.ones((B, G), bool),
    }
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params = det.init(jax.random.PRNGKey(0), sample)["params"]
    tx = make_optimizer(params, base_lr=1e-4)
    state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)
    step = jax.jit(make_train_step(det), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    state, m = step(state, batch, key)
    hard_sync(m["loss"])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key)
        # sync EVERY step: donated-buffer pipelining otherwise hides compute
        hard_sync(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt * 1000:.1f} ms/step (B={B}, {B / dt:.2f} img/s/chip)",
          flush=True)


if __name__ == "__main__":
    main()
