#!/usr/bin/env python
"""TRUE per-forward device cost via marginal (slope) timing with BOTH the
input and the params perturbed per repetition — so XLA cannot hoist any
per-forward work (bias builds, masks, folded constants) out of the
repetition loop, unlike earlier per-op benches whose absolute numbers were
dominated by the ~2 ms axon-tunnel dispatch overhead.

Profiles the flagship (4, 512, 1024) bf16 inference pipeline:
  whole simple_test / extract_feat / backbone / per-stage prefixes / stem.
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


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def marginal(fn, x, variables, k1=1, k2=3, iters=8):
    """Slope of k chained calls; params perturbed per call so per-forward
    param-dependent work is NOT hoisted; calls chained via a scalar to
    prevent overlap."""

    def rep(k):
        @jax.jit
        def f(x, variables):
            acc = jnp.float32(0.0)
            for i in range(k):
                v = jax.tree_util.tree_map(
                    lambda p: p * (1.0 + 1e-6 * (i + 1)), variables)
                out = fn(x * (1.0 + acc * 0.0 + 1e-6 * i), v)
                leaves = jax.tree_util.tree_leaves(out)
                acc = acc + sum(jnp.mean(l.astype(jnp.float32))
                                for l in leaves)
            return acc
        return f

    t1 = timeit(rep(k1), x, variables, iters=iters)
    t2 = timeit(rep(k2), x, variables, iters=iters)
    return (t2 - t1) / (k2 - k1)


def main():
    from __graft_entry__ import _flagship
    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        fold_batchnorm)

    B, H, W = 4, 512, 1024
    det0 = _flagship(compute_dtype="bfloat16")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    variables = det0.init(rng, images[:1])
    fp, fbs = fold_batchnorm(variables["params"], variables["batch_stats"])
    variables = {"params": fp, "batch_stats": fbs}
    det = _flagship(compute_dtype="bfloat16", fuse_bn=True)
    shapes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))
    sf = jnp.ones((B, 4), jnp.float32)

    t = marginal(lambda im, v: det.apply(
        v, im, shapes, sf, method=det.simple_test), images, variables,
        k1=1, k2=2, iters=4)
    print(f"simple_test (whole):   {t:7.2f} ms/batch", flush=True)

    t = marginal(lambda im, v: det.apply(
        v, im, method=lambda m, x: m.extract_feat(x)), images, variables)
    print(f"extract_feat:          {t:7.2f} ms/batch", flush=True)

    t = marginal(lambda im, v: det.apply(
        v, im, method=lambda m, x: m.backbone_m(x)), images, variables)
    print(f"backbone:              {t:7.2f} ms/batch", flush=True)

    # backbone internals: patch embed only, then prefixes of stages
    def embed_only(m, x):
        return m.backbone_m.embed_and_pos(x) \
            if hasattr(m.backbone_m, "embed_and_pos") else m.backbone_m(x)

    try:
        t = marginal(lambda im, v: det.apply(
            v, im, method=embed_only), images, variables)
        print(f"stem/patch embed:      {t:7.2f} ms/batch", flush=True)
    except Exception as e:
        print(f"stem probe skipped: {type(e).__name__} {e}", flush=True)

    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        PanoSwinTransformer)
    for n_stages in (1, 2, 3, 4):
        bb = PanoSwinTransformer(
            embed_dim=96, depths=(2, 2, 6, 2)[:n_stages],
            num_heads=(3, 6, 12, 24)[:n_stages], window_size=7,
            ape=True, drop_path_rate=0.0, out_indices=(n_stages - 1,),
            dtype="bfloat16")
        v = bb.init(jax.random.PRNGKey(0), images[:1])
        t = marginal(lambda im, vv: bb.apply(vv, im), images, v)
        print(f"backbone prefix {n_stages} stage(s): {t:7.2f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
