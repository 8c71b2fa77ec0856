#!/usr/bin/env python
"""Conv lowering shoot-out at stem shapes.

tools/bench_norm_stem.py showed lax.conv at (4,512,1024,32)->64 3x3 runs
~10 ms (77 GFLOP => ~2.5% MXU) and even a 128->128 control only hits ~5%.
This benches alternative formulations of the SAME math to find what XLA
lowers well on v5e:

  a. lax.conv (baseline), with/without f32 accumulation
  b. im2col (conv_general_dilated_patches) + GEMM
  c. sum of 9 shifted GEMMs
  d. space-to-depth(2) cell conv
  e. XLA conv in f32 end-to-end (rule out bf16-conv slow path)
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

DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


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
    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 4, 512, 1024, 32, 64
    x = jnp.asarray(rng.random((B, H, W, Cin)), jnp.bfloat16)
    k = jnp.asarray(rng.random((3, 3, Cin, Cout)) * 0.1, jnp.bfloat16)
    gflop = 2 * B * H * W * 9 * Cin * Cout / 1e9
    print(f"shape ({B},{H},{W},{Cin})->{Cout} 3x3: {gflop:.0f} GFLOP")

    nop = jax.jit(lambda x: x + 1.0)
    base = timeit(nop, x)
    print(f"dispatch baseline: {base:.2f} ms")

    def conv_std(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    print(f"a1 lax.conv f32-acc:   {timeit(jax.jit(conv_std), x):.2f} ms")

    def conv_bf(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=DN)
    print(f"a2 lax.conv bf16-acc:  {timeit(jax.jit(conv_bf), x):.2f} ms")

    def conv_im2col(x):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=DN)            # (B, H, W, 9*Cin)
        kr = k.transpose(2, 0, 1, 3).reshape(9 * Cin, Cout)
        return jnp.einsum("bhwp,pc->bhwc", p, kr,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)
    print(f"b  im2col+GEMM:        {timeit(jax.jit(conv_im2col), x):.2f} ms")

    def conv_shift(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, Cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,cd->bhwd", xp[:, dy:dy + H, dx:dx + W, :], k[dy, dx],
                    preferred_element_type=jnp.float32)
        return acc.astype(jnp.bfloat16)
    print(f"c  9 shifted GEMMs:    {timeit(jax.jit(conv_shift), x):.2f} ms")

    def conv_s2d(x):
        # space-to-depth(2): equivalent 3x3 cell conv with zero-stuffed taps
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))  # pad 1 cell
        cells = xp.reshape(B, (H + 4) // 2, 2, (W + 4) // 2, 2, Cin)
        cells = cells.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (H + 4) // 2, (W + 4) // 2, 4 * Cin)
        # build the (3,3,4Cin,4Cout) cell kernel in numpy-at-trace-time
        kk = np.zeros((3, 3, 2, 2, Cin, 2, 2, Cout), np.float32)
        karr = np.asarray(k, np.float32)
        for oy in range(2):
            for ox in range(2):
                for ty in range(3):
                    for tx in range(3):
                        iy, ix = oy + ty - 1, ox + tx - 1   # abs input offset
                        cy, py = (iy + 2) // 2 - 1, (iy + 2) % 2
                        cx, px = (ix + 2) // 2 - 1, (ix + 2) % 2
                        kk[cy + 1, cx + 1, py, px, :, oy, ox, :] += karr[ty, tx]
        kcell = jnp.asarray(
            kk.reshape(3, 3, 4 * Cin, 4 * Cout), jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            cells, kcell, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.float32)   # (B, H/2+1, W/2+1, 4Cout)
        y = y[:, :H // 2, :W // 2]
        y = y.reshape(B, H // 2, W // 2, 2, 2, Cout).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(B, H, W, Cout).astype(jnp.bfloat16)
    t = timeit(jax.jit(conv_s2d), x)
    # correctness spot-check vs std
    ref = conv_std(x)
    got = jax.jit(conv_s2d)(x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    print(f"d  s2d(2) cell conv:   {t:.2f} ms  (max|diff| vs lax.conv {err:.3e})")

    xf = x.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    def conv_f32(x):
        return jax.lax.conv_general_dilated(
            x, kf, (1, 1), "SAME", dimension_numbers=DN)
    print(f"e  lax.conv f32 io:    {timeit(jax.jit(conv_f32), xf):.2f} ms")

    # im2col correctness
    err_b = float(jnp.max(jnp.abs(
        conv_std(x).astype(jnp.float32) -
        jax.jit(conv_im2col)(x).astype(jnp.float32))))
    err_c = float(jnp.max(jnp.abs(
        conv_std(x).astype(jnp.float32) -
        jax.jit(conv_shift)(x).astype(jnp.float32))))
    print(f"im2col max|diff| {err_b:.3e}; shifted {err_c:.3e}")


if __name__ == "__main__":
    main()
