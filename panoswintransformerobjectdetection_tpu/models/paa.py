"""PAA detector (`mmdet/models/dense_heads/paa_head.py` +
`detectors/paa.py`): probabilistic anchor assignment — per gt, candidate
anchors' (cls + box) losses are modeled with a 2-component 1-D Gaussian
mixture; anchors belonging to the low-loss component become positives.

TPU formulation: the reference calls sklearn's GaussianMixture per gt on
the host; here the same 2-component EM runs as `EM_ITERS` fixed jnp
iterations over a fixed-size masked candidate set (vmapped over gts and
batch), so assignment stays inside the jitted train step.  The head is the
ATSS tower (cls / box / IoU-prediction branches), losses are focal +
GIoU (x1.3) + BCE on predicted IoU (x0.5), matching the reference config.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.anchors import AnchorGenerator
from ..core.bbox import bbox_overlaps, delta_decode
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .atss import ATSSHead
from .registry import BACKBONES, NECKS, DETECTORS, build

EM_ITERS = 8


def gmm2_split(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """1-D 2-component EM over `vals` (masked by `valid`); returns a bool
    mask of elements assigned to the LOW-mean component (the positives).
    Fixed iteration count so it jits; empty sets return all-False."""
    n = jnp.maximum(valid.sum(), 1.0)
    big = jnp.where(valid, vals, jnp.inf)
    lo = big.min()
    hi = jnp.where(valid, vals, -jnp.inf).max()
    mu = jnp.stack([lo, hi])
    var = jnp.full((2,), jnp.maximum((hi - lo) ** 2 / 12.0, 1e-4))
    pi = jnp.array([0.5, 0.5])

    def step(carry, _):
        mu, var, pi = carry
        d2 = (vals[None, :] - mu[:, None]) ** 2
        logp = (jnp.log(pi[:, None] + 1e-12)
                - 0.5 * jnp.log(2 * jnp.pi * var[:, None]) -
                d2 / (2 * var[:, None]))
        r = jax.nn.softmax(logp, axis=0) * valid[None, :]
        nk = jnp.maximum(r.sum(1), 1e-6)
        mu = (r * vals[None, :]).sum(1) / nk
        var = jnp.maximum(
            (r * (vals[None, :] - mu[:, None]) ** 2).sum(1) / nk, 1e-6)
        pi = nk / n
        return (mu, var, pi), None

    (mu, var, pi), _ = jax.lax.scan(step, (mu, var, pi), None,
                                    length=EM_ITERS)
    d2 = (vals[None, :] - mu[:, None]) ** 2
    logp = (jnp.log(pi[:, None] + 1e-12)
            - 0.5 * jnp.log(2 * jnp.pi * var[:, None])
            - d2 / (2 * var[:, None]))
    low = jnp.argmin(mu)
    pos = (logp[low] >= logp[1 - low]) & valid
    # and only below the high component's mean (tail guard)
    return pos & (vals <= mu[1 - low])


@DETECTORS.register
class PAA(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    topk: int = 9
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True, "relu_before_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = ATSSHead(num_classes=self.num_classes,
                               dtype=self.compute_dtype)
        self.anchor_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(1.0,),
            octave_base_scale=8, scales_per_octave=1)

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _anchors(self, cls_scores):
        sizes = [tuple(c.shape[1:3]) for c in cls_scores]
        per_level = self.anchor_gen.grid_anchors(sizes)
        slices, start = [], 0
        for a in per_level:
            slices.append((start, len(a)))
            start += len(a)
        return jnp.asarray(np.concatenate(per_level)), tuple(slices)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_scores, bbox_preds, iou_preds = self(images, train=True)
        anchors, slices = self._anchors(cls_scores)
        B = images.shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        iou_p = jnp.concatenate([c.reshape(B, -1) for c in iou_preds], 1)
        boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                             stds=self.target_stds)
        ac = jnp.stack([(anchors[:, 0] + anchors[:, 2]) / 2,
                        (anchors[:, 1] + anchors[:, 3]) / 2], -1)

        def single(cls_i, boxes_i, gts, glabels, gvalid):
            boxes_sg = jax.lax.stop_gradient(boxes_i)
            cls_sg = jax.lax.stop_gradient(cls_i)
            gc = jnp.stack([(gts[:, 0] + gts[:, 2]) / 2,
                            (gts[:, 1] + gts[:, 3]) / 2], -1)
            dist = jnp.linalg.norm(ac[None] - gc[:, None], axis=-1)  # (G, N)
            G, N = dist.shape
            cand = jnp.zeros((G, N), bool)
            for (start, size) in slices:
                k = min(self.topk, size)
                _, idx = jax.lax.top_k(-dist[:, start:start + size], k)
                rows = jnp.arange(G)[:, None].repeat(k, 1)
                cand = cand.at[rows.reshape(-1),
                               (idx + start).reshape(-1)].set(True)
            cand = cand & gvalid[:, None]
            # matching cost: focal cls on the gt class + (1 - IoU)
            p = jax.nn.sigmoid(cls_sg)                               # (N, C)
            pg = p.T[jnp.clip(glabels, 0, self.num_classes - 1)]     # (G, N)
            cls_cost = -0.25 * (1 - pg) ** 2 * jnp.log(jnp.clip(pg, 1e-6))
            ious = bbox_overlaps(gts, boxes_sg)                      # (G, N)
            cost = cls_cost + (1.0 - ious)
            pos_gn = jax.vmap(gmm2_split)(cost, cand)                # (G, N)
            # contested anchors go to the lowest-cost gt
            masked = jnp.where(pos_gn, cost, jnp.inf)
            best = masked.argmin(0)
            has = jnp.isfinite(masked.min(0))
            labels = jnp.where(has, glabels[best], self.num_classes)
            tgt = gts[best]
            iou_t = jnp.where(
                has, jnp.take_along_axis(ious, best[None], 0)[0], 0.0)
            return labels, tgt, iou_t, has

        labels, tgt, iou_t, pos = jax.vmap(single)(
            cls, boxes, gt_boxes, gt_labels, gt_valid)
        tgt = jax.lax.stop_gradient(tgt)
        iou_t = jax.lax.stop_gradient(iou_t)
        n_pos = jnp.maximum(pos.sum(), 1.0)
        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_pos)
        w = pos.astype(jnp.float32)
        loss_bbox = 1.3 * losses.giou_loss(boxes, tgt, weight=w,
                                           avg_factor=n_pos)
        loss_iou = 0.5 * losses.binary_cross_entropy(
            iou_p, iou_t, weight=w, avg_factor=n_pos)
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox,
                "loss_iou": loss_iou}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.6,
                    max_per_img=100) -> DetResult:
        cls_scores, bbox_preds, iou_preds = self(images, train=False)
        anchors, _ = self._anchors(cls_scores)
        B = images.shape[0]
        cls = jnp.concatenate(
            [c.reshape(B, -1, self.num_classes) for c in cls_scores], 1)
        reg = jnp.concatenate([r.reshape(B, -1, 4) for r in bbox_preds], 1)
        iou_p = jnp.concatenate([c.reshape(B, -1) for c in iou_preds], 1)
        # score = sqrt(cls * iou) (paa_head get_bboxes uses the geometric
        # combination via score voting; the sqrt fusion is its core)
        prob = jnp.sqrt(jnp.clip(
            jax.nn.sigmoid(cls) * jax.nn.sigmoid(iou_p)[..., None], 1e-12))
        boxes = delta_decode(anchors[None].repeat(B, 0), reg,
                             stds=self.target_stds)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        flat = prob.reshape(B, -1)
        k = min(nms_pre, flat.shape[1])
        top_s, top_i = jax.lax.top_k(flat, k)
        ai = top_i // self.num_classes
        li = (top_i % self.num_classes).astype(jnp.int32)
        bx = jnp.take_along_axis(boxes, ai[..., None].repeat(4, -1), 1)
        if scale_factors is not None:
            bx = bx / scale_factors[:, None, :]
        valid = top_s > score_thr

        def one(b, s, l, v):
            r = batched_nms(b, s, l, iou_threshold, max_per_img, v)
            lab = l[r.idx]
            return DetResult(r.boxes, jnp.where(r.mask, r.scores, NEG_INF),
                             jnp.where(r.mask, lab, -1), r.mask)

        return jax.vmap(one)(bx, top_s, li, valid)
