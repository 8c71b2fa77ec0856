#!/usr/bin/env python
"""Composed-backbone stage attribution: time jitted PREFIXES of the
flagship backbone (stem; stem+stage0; ...; full) with the same protocol as
tools/profile_components.py.  Successive differences give per-stage cost
as actually composed (captures inter-stage glue the per-block marginals
in tools/bench_backbone_stages.py miss)."""

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
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        PanoSwinTransformer)

    B, H, W = 4, 512, 1024
    dt = "bfloat16"
    bk = PanoSwinTransformer(dtype=dt, fuse_bn=True, drop_path_rate=0.0)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)),
                         jnp.float32)
    variables = bk.init(rng, images[:1])
    # fold BN stats the way the flagship bench does
    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        fold_batchnorm)
    fp, fbs = fold_batchnorm(variables["params"], variables["batch_stats"])
    variables = {"params": fp, "batch_stats": fbs}

    # rebuild the same-named submodules inline (names/classes/args must
    # mirror PanoSwinTransformer.__call__ so `variables` resolves)
    from panoswintransformerobjectdetection_tpu.models.panoswin import BasicLayer
    from panoswintransformerobjectdetection_tpu.models.layers import (
        ConvStemPatchEmbed)
    from panoswintransformerobjectdetection_tpu.geometry.sphere import (
        make_uv_grid)

    def prefix(n_stages):
        def fn(m, img):
            x = ConvStemPatchEmbed(bk.patch_size, bk.embed_dim,
                                   use_norm=bk.patch_norm, dtype=bk.dtype,
                                   fuse_bn=True, name="patch_embed")(img)
            _, h, w, _ = x.shape
            uv = make_uv_grid(h, w)
            for i in range(n_stages):
                dim_i = int(bk.embed_dim * 2 ** i)
                x_out, x, uv = BasicLayer(
                    dim=dim_i, depth=bk.depths[i], num_heads=bk.num_heads[i],
                    window_size=bk.window_size, dtype=bk.dtype,
                    downsample=i < len(bk.depths) - 1,
                    name=f"layers_{i}")(x, uv, pano_mode=True,
                                        deterministic=True)
            return x
        return jax.jit(lambda img: bk.apply(variables, img, method=fn))

    full = jax.jit(lambda img: bk.apply(variables, img))
    t_full = timeit(full, images)
    print(f"full backbone (incl. out-norms): {t_full:.2f} ms", flush=True)

    prev = 0.0
    for ns in range(5):
        t = timeit(prefix(ns), images)
        label = "stem" if ns == 0 else f"+stage{ns-1}"
        print(f"prefix {label}: {t:.2f} ms  (delta {t - prev:+.2f})", flush=True)
        prev = t
    print(f"out-norms + glue vs full: {t_full - prev:+.2f} ms", flush=True)


if __name__ == "__main__":
    main()
