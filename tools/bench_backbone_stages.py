#!/usr/bin/env python
"""Marginal-cost timing of PanoSwin-T backbone components at flagship
geometry (B=4, 512x1024, bf16).

Per-call dispatch through the axon tunnel costs ~2-3 ms, so standalone
timings of sub-ms ops are fiction.  Here every component is measured as a
MARGINAL cost: jit a chain of k2 copies and k1 copies (k2 > k1), time
both, and report (t_k2 - t_k1) / (k2 - k1).  Chains reuse the same
weights on scaled inputs (x * c_i with distinct c_i) so XLA cannot CSE
repeated applications.
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


def marginal(apply_fn, x, k1=1, k2=3, chain=False):
    """apply_fn(x)->y.  chain=True feeds y back (same-shape component);
    otherwise k scaled applications are summed scalar-wise."""
    def rep(k):
        if chain:
            def f(a):
                for i in range(k):
                    a = apply_fn(a * (1.0 + 1e-4 * i))
                return a
        else:
            def f(a):
                acc = 0.0
                for i in range(k):
                    acc = acc + apply_fn(a * (1.0 + 1e-4 * i)).sum()
                return acc
        return jax.jit(f)
    t1 = timeit(rep(k1), x)
    t2 = timeit(rep(k2), x)
    return (t2 - t1) / (k2 - k1)


def main():
    from panoswintransformerobjectdetection_tpu.models.panoswin import (
        PanoSwinBlock, WindowAttention, sphere_bias)
    from panoswintransformerobjectdetection_tpu.models.layers import (
        ConvStemPatchEmbed, PatchMerging, Mlp)
    from panoswintransformerobjectdetection_tpu.geometry.sphere import (
        make_uv_grid)
    from panoswintransformerobjectdetection_tpu.ops.windows import (
        window_partition, window_transition, make_relative_position_index)

    B = 4
    dt = "bfloat16"
    rng = jax.random.PRNGKey(0)

    imgs = jnp.asarray(np.random.default_rng(0).random((B, 512, 1024, 3)),
                       jnp.bfloat16)
    stem = ConvStemPatchEmbed(4, 96, dtype=dt, fuse_bn=True)
    sv = stem.init(rng, imgs[:1])
    t = marginal(lambda a: stem.apply(sv, a), imgs)
    print(f"patch_embed fused-BN (marginal): {t:.2f} ms")

    # individual stem convs
    import flax.linen as nn
    for name, cin, cout, kern, stride in (
            ("conv0 3->32 3x3@512x1024", 3, 32, (3, 3), (1, 1)),
            ("conv1 32->64 3x3@512x1024", 32, 64, (3, 3), (1, 1)),
            ("proj 64->96 4x4s4", 64, 96, (4, 4), (4, 4))):
        conv = nn.Conv(cout, kern, strides=stride, padding=1 if stride == (1, 1) else 0,
                       dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(1).random((B, 512, 1024, cin)),
                        jnp.bfloat16)
        cv = conv.init(rng, x[:1])
        t = marginal(lambda a, cv=cv, conv=conv: conv.apply(cv, a), x)
        print(f"stem {name} (marginal): {t:.2f} ms")

    stage_cfg = [
        (96, 128, 256, 3, 2),
        (192, 64, 128, 6, 2),
        (384, 32, 64, 12, 6),
        (768, 16, 32, 24, 2),
    ]
    total = 0.0
    for si, (dim, H, W, heads, n) in enumerate(stage_cfg):
        x = jnp.asarray(np.random.default_rng(si).random((B, H, W, dim)),
                        jnp.bfloat16)
        uv = make_uv_grid(H, W)
        for shift, label in ((0, "W-MSA"), (3, "SW-MSA")):
            blk = PanoSwinBlock(dim=dim, num_heads=heads, window_size=7,
                                shift_size=shift, dtype=dt)
            bv = blk.init(rng, x[:1], uv)
            tb = marginal(lambda a, bv=bv, blk=blk, uv=uv: blk.apply(bv, a, uv),
                          x, chain=True)
            print(f"stage{si} {label} block ({H}x{W}x{dim}): {tb:.2f} ms"
                  f"  (x{n // 2} in model)")
            total += tb * (n // 2)
    print(f"sum of block marginals: {total:.1f} ms")

    # between-stage glue: patch merging, out-norms, ape encoder
    from panoswintransformerobjectdetection_tpu.models.layers import layer_norm

    class OutNorm(nn.Module):
        @nn.compact
        def __call__(self, a):
            return layer_norm("n")(a.astype(jnp.float32))

    for si, (dim, H, W, _, _) in enumerate(stage_cfg):
        x = jnp.asarray(np.random.default_rng(si + 20).random((B, H, W, dim)),
                        jnp.bfloat16)
        if si < 3:
            pm = PatchMerging(dtype=dt)
            pv = pm.init(rng, x[:1])
            t = marginal(lambda a, pv=pv, pm=pm: pm.apply(pv, a), x)
            print(f"patch_merging s{si}->s{si+1} ({H}x{W}x{dim}): {t:.2f} ms")
        onm = OutNorm()
        ov = onm.init(rng, x[:1])
        t = marginal(lambda a, ov=ov, onm=onm: onm.apply(ov, a), x)
        print(f"out-norm s{si} f32 ({H}x{W}x{dim}): {t:.2f} ms")

    # stage-0 sub-ops, marginal
    dim, H, W, heads = 96, 128, 256, 3
    x = jnp.asarray(np.random.default_rng(9).random((B, H, W, dim)),
                    jnp.bfloat16)
    uv = make_uv_grid(H, W)
    t = marginal(lambda a: window_transition(a, 3, True), x)
    print(f"s0 window_transition pano (marginal): {t:.2f} ms")

    ws = 7
    xp = jnp.pad(x, ((0, 0), (0, 5), (0, 3), (0, 0)))
    t = marginal(lambda a: window_partition(a, ws).reshape(-1, ws * ws, dim), xp)
    print(f"s0 window_partition (marginal): {t:.2f} ms")

    wins = window_partition(xp, ws).reshape(-1, ws * ws, dim)
    uvp = jnp.pad(uv, ((0, 5), (0, 3), (0, 0)))
    uvw = window_partition(uvp[None], ws).reshape(-1, ws * ws, 2)
    att = WindowAttention(dim, ws, heads, dtype=dt)
    av = att.init(rng, wins[: wins.shape[0] // B], uvw)
    t = marginal(lambda a: att.apply(av, a, uvw), wins, chain=True)
    print(f"s0 window_attention (marginal): {t:.2f} ms")

    alpha = jnp.zeros((169, heads), jnp.float32)
    beta = jnp.zeros((169, heads), jnp.float32)
    ri = make_relative_position_index(ws)
    t = marginal(lambda u: sphere_bias(alpha, beta, ri, u, u, True), uvw)
    print(f"s0 sphere_bias (marginal): {t:.2f} ms")

    mlp = Mlp(dim * 4, dtype=dt)
    mv = mlp.init(rng, x[:1])
    t = marginal(lambda a: mlp.apply(mv, a), x, chain=True)
    print(f"s0 mlp (marginal): {t:.2f} ms")

    # layernorm marginal (2 per block)
    from panoswintransformerobjectdetection_tpu.models.layers import layer_norm

    class LN(nn.Module):
        @nn.compact
        def __call__(self, a):
            return layer_norm("n")(a)
    ln = LN()
    lv = ln.init(rng, x[:1])
    t = marginal(lambda a: ln.apply(lv, a), x, chain=True)
    print(f"s0 layer_norm (marginal): {t:.2f} ms")


if __name__ == "__main__":
    main()
