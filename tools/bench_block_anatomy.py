#!/usr/bin/env python
"""Decompose one stage-0 PanoSwin block (~6.3 ms) into its pieces.

Times jitted sub-graphs at the stage-0 shape (4, 128, 256, 96) bf16:
ablations of the full block (no-transition, no-attn-bias, mlp-only,
attn-only) to find where the 6.3 ms goes.  Each variant is one jit, so
per-dispatch overhead (~2 ms through the tunnel) cancels in deltas.
"""

import os
import sys
import time
from functools import partial

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


def timeit(fn, *args, iters=20, warmup=3):
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
    from panoswintransformerobjectdetection_tpu.geometry.sphere import (
        make_uv_grid)

    B, H, W, C = 4, 128, 256, 96
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, H, W, C)), jnp.bfloat16)
    uv = make_uv_grid(H, W)

    nop = jax.jit(lambda x: x + 1.0)
    base = timeit(nop, x)
    print(f"dispatch baseline: {base:.2f} ms")

    key = jax.random.PRNGKey(0)

    def build(shift):
        blk = PanoSwinBlock(dim=C, num_heads=3, window_size=7,
                            shift_size=shift, dtype="bfloat16")
        v = blk.init(key, x, uv, True, True)
        return blk, v

    blk0, v0 = build(0)
    f_pano = jax.jit(lambda x: blk0.apply(v0, x, uv, True, True))
    print(f"block shift=0 pano:    {timeit(f_pano, x) - base:.2f} ms")

    f_planar = jax.jit(lambda x: blk0.apply(v0, x, jnp.zeros_like(uv), False, True))
    print(f"block shift=0 planar:  {timeit(f_planar, x) - base:.2f} ms")

    blk3, v3 = build(3)
    f_pano3 = jax.jit(lambda x: blk3.apply(v3, x, uv, True, True))
    print(f"block shift=3 pano:    {timeit(f_pano3, x) - base:.2f} ms")
    f_planar3 = jax.jit(lambda x: blk3.apply(v3, x, jnp.zeros_like(uv), False, True))
    print(f"block shift=3 planar:  {timeit(f_planar3, x) - base:.2f} ms")

    # pieces
    from panoswintransformerobjectdetection_tpu.models.layers import Mlp
    mlp = Mlp(4 * C, dtype="bfloat16")
    vm = mlp.init(key, x)
    f_mlp = jax.jit(lambda x: mlp.apply(vm, x))
    print(f"mlp alone:             {timeit(f_mlp, x) - base:.2f} ms")

    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        WindowAttention, sphere_bias)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, window_reverse)
    ws = 7
    xp = jnp.pad(x, ((0, 0), (0, (-H) % ws), (0, (-W) % ws), (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    wins = window_partition(xp, ws).reshape(-1, ws * ws, C)
    uvp = jnp.pad(uv, ((0, (-H) % ws), (0, (-W) % ws), (0, 0)))
    uvw = window_partition(uvp[None], ws).reshape(-1, ws * ws, 2)

    attn = WindowAttention(C, ws, 3, dtype="bfloat16")
    va = attn.init(key, wins, uvw, None, True)
    f_attn = jax.jit(lambda w: attn.apply(va, w, uvw, None, True))
    print(f"window attn (pano):    {timeit(f_attn, wins) - base:.2f} ms")
    f_attn_pl = jax.jit(lambda w: attn.apply(va, w, uvw, None, False))
    print(f"window attn (planar):  {timeit(f_attn_pl, wins) - base:.2f} ms")

    # the sphere bias alone (haversine + two table lookups)
    p = attn.init(key, wins, uvw, None, True)["params"]
    at, bt = p["alpha_table"], p["beta_table"]
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        make_relative_position_index)
    ri = make_relative_position_index(ws)
    f_bias = jax.jit(lambda u: sphere_bias(at, bt, ri, u, u, True))
    print(f"sphere bias alone:     {timeit(f_bias, uvw) - base:.2f} ms")

    # partition+reverse round trip
    f_pr = jax.jit(lambda x: window_reverse(
        window_partition(jnp.pad(x, ((0, 0), (0, (-H) % ws), (0, (-W) % ws), (0, 0))), ws)
        .reshape(-1, ws, ws, C).reshape(-1, ws, ws, C), ws, Hp, Wp)[:, :H, :W])
    print(f"partition+reverse:     {timeit(f_pr, x) - base:.2f} ms")

    # qkv + proj matmuls at window layout
    wq = jnp.asarray(rng.random((C, 3 * C)), jnp.bfloat16)
    f_qkv = jax.jit(lambda w: jnp.einsum("noc,cd->nod", w, wq))
    print(f"qkv matmul:            {timeit(f_qkv, wins) - base:.2f} ms")


if __name__ == "__main__":
    main()
