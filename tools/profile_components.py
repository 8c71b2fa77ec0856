#!/usr/bin/env python
"""Component timing on the real chip: backbone / FPN+RPN conv / proposals
(NMS) / RoI stage, to locate the inference bottleneck."""

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
    """block_until_ready does not sync through the axon tunnel; a
    device->host fetch of one SCALAR does (a full-leaf fetch would be
    bottlenecked by the tunnel's ~70 MB/s host link)."""
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
    from __graft_entry__ import _flagship
    from panoswintransformerobjectdetection_tpu.models.rpn_head import rpn_proposals
    from panoswintransformerobjectdetection_tpu.models.roi_head import (
        multilevel_roi_align, bbox_head_detections)

    B, H, W = 4, 512, 1024
    # match bench.py: bf16 compute + fused inference BN
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    det0 = _flagship(compute_dtype=dtype)
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).random((B, H, W, 3)), jnp.float32)
    variables = det0.init(rng, images[:1])
    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        fold_batchnorm)
    fp, fbs = fold_batchnorm(variables["params"], variables["batch_stats"])
    variables = {"params": fp, "batch_stats": fbs}
    det = _flagship(compute_dtype=dtype, fuse_bn=True)
    shapes = jnp.tile(jnp.array([[H, W]], jnp.float32), (B, 1))

    backbone = jax.jit(lambda im: det.apply(
        variables, im, method=lambda m, x: m.backbone_m(x)))
    t_bb = timeit(backbone, images)
    print(f"backbone: {t_bb:.1f} ms/batch")

    feat_fn = jax.jit(lambda im: det.apply(
        variables, im, method=lambda m, x: m.extract_feat(x)))
    t_feat = timeit(feat_fn, images)
    print(f"backbone+FPN: {t_feat:.1f} ms/batch")

    feats = feat_fn(images)

    rpn_fwd = jax.jit(lambda f: det.apply(
        variables, f, method=lambda m, x: m.rpn_m(x)))
    t_rpn = timeit(rpn_fwd, feats)
    print(f"RPN convs: {t_rpn:.1f} ms/batch")

    cls_scores, bbox_preds = rpn_fwd(feats)
    sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    from panoswintransformerobjectdetection_tpu.core.anchors import AnchorGenerator
    gen = AnchorGenerator(strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
                          scales=(8.0,))
    level_anchors = [jnp.asarray(a) for a in gen.grid_anchors(sizes)]

    prop_fn = jax.jit(lambda c, b: rpn_proposals(
        c, b, level_anchors, shapes, nms_pre=1000, max_per_img=1000,
        iou_threshold=0.7))
    t_prop = timeit(prop_fn, cls_scores, bbox_preds)
    print(f"proposals (topk+decode+NMS): {t_prop:.1f} ms/batch")

    props = prop_fn(cls_scores, bbox_preds)
    P = props.boxes.shape[1]
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.float32)[:, None], (B, P))
    rois = jnp.concatenate([bidx[..., None], props.boxes], axis=-1).reshape(-1, 5)

    roi_fn = jax.jit(lambda f, r: multilevel_roi_align(f[:4], r))
    t_roi = timeit(roi_fn, feats, rois)
    print(f"RoIAlign x{B*P}: {t_roi:.1f} ms/batch")

    rf = roi_fn(feats, rois)
    head_fn = jax.jit(lambda x: det.apply(
        variables, x, method=lambda m, v: m.bbox_head_m(v)))
    t_head = timeit(head_fn, rf)
    print(f"bbox head fc: {t_head:.1f} ms/batch")

    cls, reg = head_fn(rf)
    det_fn = jax.jit(lambda c, r: bbox_head_detections(
        c.reshape(B, P, -1), r.reshape(B, P, -1),
        rois.reshape(B, P, 5), shapes, 5))
    t_det = timeit(det_fn, cls, reg)
    print(f"decode+multiclass NMS: {t_det:.1f} ms/batch")


if __name__ == "__main__":
    main()
