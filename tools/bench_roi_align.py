#!/usr/bin/env python
"""A/B experiments on multilevel RoIAlign formulations (real chip).

The per-image GEMM RoIAlign is bandwidth-bound on the stage-1
intermediate t = (B, P, o, Wl, C) (~1.9 GB at the flagship's level 0).
Contracting the W axis first makes t proportional to Hl instead of Wl —
half the traffic for 2:1 panoramas.  This tool measures the variants
honestly (scalar-fetch sync through the axon tunnel).
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
    from panoswintransformerobjectdetection_tpu.ops.roi_align import (
        multilevel_roi_align)

    B, P, C = 4, 1000, 256
    H, W = 512, 1024
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal(
        (B, H // s, W // s, C)).astype(np.float32), dtype)
        for s in (4, 8, 16, 32)]
    # realistic roi mix: log-uniform scale in [16, 512]
    scale = np.exp(rng.uniform(np.log(16), np.log(512), (B, P)))
    ar = np.exp(rng.uniform(np.log(0.5), np.log(2.0), (B, P)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    x1 = rng.uniform(0, W, (B, P))
    y1 = rng.uniform(0, H, (B, P))
    rois = np.zeros((B, P, 5), np.float32)
    rois[..., 0] = np.arange(B)[:, None]
    rois[..., 1] = x1
    rois[..., 2] = y1
    rois[..., 3] = np.minimum(x1 + w, W)
    rois[..., 4] = np.minimum(y1 + h, H)
    rois = jnp.asarray(rois.reshape(B * P, 5))

    from panoswintransformerobjectdetection_tpu.ops import roi_align as ra

    stats = ra.window_engage_stats(
        [(f.shape[1], f.shape[2]) for f in feats], np.asarray(rois),
        per_image=P)
    print(f"windowed-crop engage rate on this roi mix: "
          f"{stats['ok_fraction']:.1%} ok, max {stats['max_over_per_image']} "
          f"overflow/image (budget {stats['overflow_budget']}) -> "
          f"{stats['branch']}", flush=True)

    outs = {}
    for use_pallas in (False, True):
        ra.USE_PALLAS_CROP = use_pallas
        fn = jax.jit(lambda f, r: multilevel_roi_align(f, r, per_image=P))
        outs[use_pallas] = np.asarray(fn(feats, rois), np.float32)
        t = timeit(fn, feats, rois)
        label = "pallas fused crop" if use_pallas else "xla einsum pair"
        print(f"{label}: {t:.1f} ms", flush=True)
    ra.USE_PALLAS_CROP = None
    err = np.max(np.abs(outs[True] - outs[False]))
    print(f"pallas vs xla max|diff| = {err:.3e}")


if __name__ == "__main__":
    main()
