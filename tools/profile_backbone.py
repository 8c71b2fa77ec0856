#!/usr/bin/env python
"""Intra-backbone timing on the real chip.

The component profile (tools/profile_components.py) shows the backbone at
~40 ms/batch — over half the full simple_test.  This drills in:

  1. stem (3-conv patch embed) alone
  2. per-stage deltas (prefix models: depths (2,), (2,2), (2,2,6), (2,2,6,2))
  3. pano vs planar mode (isolates the pano-shift / sphere-bias overhead)
  4. layout-op microbenches at stage-1 shape (norm / transition / partition)
     to test the bandwidth-bound hypothesis

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
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        PanoSwinTransformer)
    from panoswintransformerobjectdetection_tpu.models.layers import (
        ConvStemPatchEmbed)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, window_reverse, window_transition,
        window_transition_reverse)

    B, H, W = 4, 512, 1024
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)

    # 1. stem alone
    stem = ConvStemPatchEmbed(4, 96, dtype=dtype)
    sv = stem.init(rng, images[:1])
    stem_fn = jax.jit(lambda im: stem.apply(sv, im))
    print(f"stem (3-conv patch embed): {timeit(stem_fn, images):.1f} ms")

    # 2. per-stage deltas via prefix models
    full_depths = (2, 2, 6, 2)
    heads = (3, 6, 12, 24)
    prev = 0.0
    for k in range(1, 5):
        bb = PanoSwinTransformer(
            embed_dim=96, depths=full_depths[:k], num_heads=heads[:k],
            window_size=7, ape=True, drop_path_rate=0.0,
            out_indices=tuple(range(k)), dtype=dtype)
        v = bb.init(rng, images[:1])
        fn = jax.jit(lambda im, bb=bb, v=v: bb.apply(v, im))
        t = timeit(fn, images)
        print(f"prefix depths {full_depths[:k]}: {t:.1f} ms "
              f"(stage {k - 1} delta ~{t - prev:.1f} ms)")
        prev = t

    # 3. pano vs planar
    bb = PanoSwinTransformer(embed_dim=96, depths=full_depths,
                             num_heads=heads, window_size=7, ape=True,
                             drop_path_rate=0.0, dtype=dtype)
    v = bb.init(rng, images[:1])
    fn_planar = jax.jit(
        lambda im: bb.apply(v, im, pano_mode=False))
    print(f"planar mode (full): {timeit(fn_planar, images):.1f} ms")

    # 4. layout microbenches at stage-1 shape
    x1 = jnp.asarray(np.random.default_rng(1).random((B, 128, 256, 96)),
                     jnp.bfloat16)

    ln = jax.jit(lambda x: jax.nn.standardize(x.astype(jnp.float32),
                                              axis=-1).astype(x.dtype))
    print(f"layernorm-ish pass (4,128,256,96): {timeit(ln, x1):.2f} ms")

    tr = jax.jit(lambda x: window_transition_reverse(
        window_transition(x, 3, True), 3, True))
    print(f"pano transition fwd+rev: {timeit(tr, x1):.2f} ms")

    def part(x):
        xp = jnp.pad(x, ((0, 0), (0, 5), (0, 3), (0, 0)))
        w = window_partition(xp, 7).reshape(-1, 49, 96)
        return window_reverse(w.reshape(-1, 7, 7, 96), 7, 133, 259)
    pp = jax.jit(part)
    print(f"window partition+reverse: {timeit(pp, x1):.2f} ms")

    roll = jax.jit(lambda x: jnp.roll(x, shift=(3, 3), axis=(1, 2)))
    print(f"2-D roll: {timeit(roll, x1):.2f} ms")

    add = jax.jit(lambda x: x + x * 1.5)
    print(f"elementwise pass: {timeit(add, x1):.2f} ms")


if __name__ == "__main__":
    main()
