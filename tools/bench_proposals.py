#!/usr/bin/env python
"""A/B experiments on the RPN proposals stage (topk+decode+NMS) at
flagship geometry.  Measures sub-parts with marginal-cost timing and
compares gather-based vs sort-co-operand top-k selection (XLA gathers
serialize on this backend)."""

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
    from panoswintransformerobjectdetection_tpu.core.anchors import (
        AnchorGenerator)
    from panoswintransformerobjectdetection_tpu.models.rpn_head import (
        rpn_proposals)
    from panoswintransformerobjectdetection_tpu.ops.nms import nms

    B, H, W = 4, 512, 1024
    rng = np.random.default_rng(0)
    sizes = [(H // s, W // s) for s in (4, 8, 16, 32, 64)]
    cls_scores = [jnp.asarray(rng.standard_normal(
        (B, h, w, 3)).astype(np.float32), jnp.bfloat16) for h, w in sizes]
    bbox_preds = [jnp.asarray(rng.standard_normal(
        (B, h, w, 12)).astype(np.float32), jnp.bfloat16) for h, w in sizes]
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
                          scales=(8.0,))
    anchors = [jnp.asarray(a) for a in gen.grid_anchors(sizes)]
    shapes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))

    full = jax.jit(lambda c, b: rpn_proposals(
        c, b, anchors, shapes, nms_pre=1000, max_per_img=1000,
        iou_threshold=0.7))
    print(f"full rpn_proposals: {timeit(full, cls_scores, bbox_preds):.2f} ms")

    # -- sub-part: per-level topk + gathers only
    def topk_gather(c, b):
        outs = []
        for cc, rr, a in zip(c, b, anchors):
            sc = jax.nn.sigmoid(cc.reshape(B, -1))
            rg = rr.reshape(B, -1, 4)
            k = min(1000, sc.shape[1])
            top_sc, top_i = jax.lax.top_k(sc, k)
            top_rg = jnp.take_along_axis(rg, top_i[..., None], axis=1)
            top_a = a[top_i]
            outs.append((top_sc, top_rg, top_a))
        return outs
    print(f"topk+gathers only: {timeit(jax.jit(topk_gather), cls_scores, bbox_preds):.2f} ms")

    # -- alternative: multi-operand sort carries deltas+anchors with keys
    def topk_sort(c, b):
        outs = []
        for cc, rr, a in zip(c, b, anchors):
            sc = jax.nn.sigmoid(cc.reshape(B, -1).astype(jnp.float32))
            rg = rr.reshape(B, -1, 4).astype(jnp.float32)
            n = sc.shape[1]
            k = min(1000, n)
            ab = jnp.broadcast_to(a[None].astype(jnp.float32), (B, n, 4))
            ops = [-sc] + [rg[..., i] for i in range(4)] \
                + [ab[..., i] for i in range(4)]
            sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
            top_sc = -sorted_ops[0][:, :k]
            top_rg = jnp.stack([o[:, :k] for o in sorted_ops[1:5]], -1)
            top_a = jnp.stack([o[:, :k] for o in sorted_ops[5:9]], -1)
            outs.append((top_sc, top_rg, top_a))
        return outs
    print(f"topk via multi-operand sort: {timeit(jax.jit(topk_sort), cls_scores, bbox_preds):.2f} ms")

    # -- sub-part: the 20 vmapped NMS runs alone
    boxes = jnp.asarray(rng.uniform(0, 1000, (20, 1000, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 50)
    scores = jnp.asarray(rng.random((20, 1000)).astype(np.float32))
    nms_fn = jax.jit(jax.vmap(lambda bb, ss: nms(bb, ss, 0.7, 1000)))
    print(f"vmapped NMS 20x1000: {timeit(nms_fn, boxes, scores):.2f} ms")


if __name__ == "__main__":
    main()
