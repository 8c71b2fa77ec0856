#!/usr/bin/env python
"""Per-stage / per-sub-op timing of the PanoSwin-T backbone at flagship
geometry (B=4, 512x1024, bf16) to locate where the backbone's ms go.
Each component is timed standalone with honest scalar-fetch sync."""

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
        PanoSwinBlock)
    from panoswintransformerobjectdetection_tpu.models.layers import (
        ConvStemPatchEmbed, PatchMerging)
    from panoswintransformerobjectdetection_tpu.geometry.sphere import (
        make_uv_grid)

    B = 4
    dt = "bfloat16"
    rng = jax.random.PRNGKey(0)
    total = 0.0

    imgs = jnp.asarray(np.random.default_rng(0).random((B, 512, 1024, 3)),
                       jnp.float32)
    stem = ConvStemPatchEmbed(4, 96, dtype=dt)
    sv = stem.init(rng, imgs[:1])
    t = timeit(jax.jit(lambda v, x: stem.apply(v, x)), sv, imgs)
    print(f"patch_embed (conv stem): {t:.1f} ms")
    total += t

    stage_cfg = [  # (dim, H, W, heads, n_blocks)
        (96, 128, 256, 3, 2),
        (192, 64, 128, 6, 2),
        (384, 32, 64, 12, 6),
        (768, 16, 32, 24, 2),
    ]
    for si, (dim, H, W, heads, n) in enumerate(stage_cfg):
        x = jnp.asarray(np.random.default_rng(si).random((B, H, W, dim)),
                        jnp.bfloat16)
        uv = make_uv_grid(H, W)
        for shift in (0, 3):
            blk = PanoSwinBlock(dim=dim, num_heads=heads, window_size=7,
                                shift_size=shift, dtype=dt)
            bv = blk.init(rng, x[:1], uv)
            tb = timeit(jax.jit(lambda v, a, u: blk.apply(v, a, u)), bv, x, uv)
            print(f"stage{si} block shift={shift} ({H}x{W}x{dim}): {tb:.2f} ms"
                  f"  (x{n // 2} in model)")
            total += tb * (n // 2)
        if si < 3:
            pm = PatchMerging(dtype=dt)
            pv = pm.init(rng, x[:1])
            tp = timeit(jax.jit(lambda v, a: pm.apply(v, a)), pv, x)
            print(f"stage{si} patch_merge: {tp:.2f} ms")
            total += tp

    print(f"sum of parts: {total:.1f} ms")

    # sub-op drilldown on the hottest stage0 block shape
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, window_reverse, window_transition)
    dim, H, W, heads = 96, 128, 256, 3
    x = jnp.asarray(np.random.default_rng(9).random((B, H, W, dim)),
                    jnp.bfloat16)
    uv = make_uv_grid(H, W)

    t = timeit(jax.jit(lambda a: window_transition(a, 3, True)), x)
    print(f"s0 window_transition(pano): {t:.2f} ms")
    ws = 7
    ph, pw = (-H) % ws, (-W) % ws
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))

    def part(a):
        return window_partition(a, ws).reshape(-1, ws * ws, dim)
    t = timeit(jax.jit(part), xp)
    print(f"s0 window_partition: {t:.2f} ms")

    wins = part(xp)
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        WindowAttention)
    uvp = jnp.pad(uv, ((0, ph), (0, pw), (0, 0)))
    uvw = window_partition(uvp[None], ws).reshape(-1, ws * ws, 2)
    att = WindowAttention(dim, ws, heads, dtype=dt)
    av = att.init(rng, wins[: wins.shape[0] // B], uvw)
    t = timeit(jax.jit(lambda v, a, u: att.apply(v, a, u)), av, wins, uvw)
    print(f"s0 window_attention (qkv+bias+softmax+proj): {t:.2f} ms")

    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        sphere_bias)
    alpha = jnp.zeros((169, heads), jnp.float32)
    beta = jnp.zeros((169, heads), jnp.float32)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        make_relative_position_index)
    ri = make_relative_position_index(ws)
    t = timeit(jax.jit(lambda a, b, u: sphere_bias(a, b, ri, u, u, True)),
               alpha, beta, uvw)
    print(f"s0 sphere_bias alone: {t:.2f} ms")

    from panoswintransformerobjectdetection_tpu.models.layers import Mlp
    mlp = Mlp(dim * 4, dtype=dt)
    mv = mlp.init(rng, x[:1])
    t = timeit(jax.jit(lambda v, a: mlp.apply(v, a)), mv, x)
    print(f"s0 mlp: {t:.2f} ms")


if __name__ == "__main__":
    main()
