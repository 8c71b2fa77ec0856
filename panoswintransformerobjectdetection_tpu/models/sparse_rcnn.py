"""Sparse R-CNN (`mmdet/models/detectors/sparse_rcnn.py` +
`roi_heads/bbox_heads/dii_head.py` + `dense_heads/embedding_rpn_head.py`):
a fixed set of learned proposal boxes + proposal features refined by
`num_stages` dynamic instance interactive heads — self-attention among
proposals, dynamic 1x1 convs (parameters generated from each proposal's
feature) over its RoI features, then per-stage cls + box-delta heads.
Set prediction: every stage is Hungarian-matched (focal + L1 + GIoU cost),
no NMS at test.

TPU notes: all stages unroll statically; the dynamic conv is one einsum
pair; matching reuses `detr.hungarian_match` (scipy via pure_callback).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.bbox import bbox_overlaps, delta_decode
from ..ops.nms import DetResult, NEG_INF
from .detr import MHSA, hungarian_match
from .roi_head import multilevel_roi_align
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build
from .layers import trunc_init


@HEADS.register
class DIIHead(nn.Module):
    """Dynamic Instance Interactive head (`dii_head.py`)."""
    num_classes: int = 80
    dim: int = 256
    dyn_channels: int = 64
    roi_size: int = 7
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, roi_feats, prop_feats):
        """roi_feats (B, N, s*s, C); prop_feats (B, N, C).
        Returns (cls (B, N, num_classes), deltas (B, N, 4), new feats)."""
        B, N, S, C = roi_feats.shape
        # 1. self-attention among proposal features
        y = MHSA(self.dim, name="self_attn")(prop_feats, prop_feats,
                                             prop_feats)
        pf = nn.LayerNorm(name="norm_attn")(prop_feats + y)
        # 2. dynamic interaction: two 1x1 convs with generated params
        d = self.dyn_channels
        params = nn.Dense(2 * C * d, name="dyn_params")(pf)
        w1 = params[..., :C * d].reshape(B, N, C, d)
        w2 = params[..., C * d:].reshape(B, N, d, C)
        x = jnp.einsum("bnsc,bncd->bnsd", roi_feats, w1)
        x = nn.relu(nn.LayerNorm(name="dyn_norm1")(x))
        x = jnp.einsum("bnsd,bndc->bnsc", x, w2)
        x = nn.relu(nn.LayerNorm(name="dyn_norm2")(x))
        x = nn.Dense(self.dim, name="dyn_out")(x.reshape(B, N, S * C))
        pf = nn.LayerNorm(name="norm_dyn")(pf + x)
        # 3. FFN
        f = nn.Dense(self.dim, name="ffn2")(
            nn.relu(nn.Dense(self.ffn_dim, name="ffn1")(pf)))
        pf = nn.LayerNorm(name="norm_ffn")(pf + f)
        # 4. heads
        c = pf
        for i in range(1):
            c = nn.relu(nn.LayerNorm(name=f"cls_ln{i}")(
                nn.Dense(self.dim, name=f"cls_fc{i}")(c)))
        cls = nn.Dense(self.num_classes, name="fc_cls",
                       bias_init=nn.initializers.constant(-4.595))(c)
        r = pf
        for i in range(3):
            r = nn.relu(nn.LayerNorm(name=f"reg_ln{i}")(
                nn.Dense(self.dim, name=f"reg_fc{i}")(r)))
        deltas = nn.Dense(4, name="fc_reg")(r)
        return cls, deltas, pf


@DETECTORS.register
class SparseRCNN(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    num_proposals: int = 100
    num_stages: int = 6
    dim: int = 256
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    stage_stds: Tuple[float, ...] = (0.5, 0.5, 1.0, 1.0)
    cls_weight: float = 2.0
    bbox_weight: float = 5.0
    giou_weight: float = 2.0
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (256, 512, 1024, 2048),
            "out_channels": self.dim, "num_outs": 4})
        self.neck_m = build(NECKS, neck_cfg)
        # embedding RPN: whole-image boxes + learned features
        self.init_feats = self.param("init_proposal_features", trunc_init,
                                     (self.num_proposals, self.dim))
        self.stages = [DIIHead(num_classes=self.num_classes, dim=self.dim,
                               name=f"stage{i}")
                       for i in range(self.num_stages)]

    def _stage_boxes(self, images):
        """EmbeddingRPNHead init: every proposal spans the whole image."""
        B, H, W, _ = images.shape
        box = jnp.array([0.0, 0.0, W, H], jnp.float32)
        return jnp.broadcast_to(box[None, None],
                                (B, self.num_proposals, 4))

    def _run_stages(self, images, train):
        feats = self.neck_m(self.backbone_m(images, train=train))
        B = images.shape[0]
        boxes = self._stage_boxes(images)
        pf = jnp.broadcast_to(self.init_feats[None],
                              (B, self.num_proposals, self.dim))
        outs = []
        for stage in self.stages:
            N = self.num_proposals
            bidx = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.float32)[:, None], (B, N))
            rois = jnp.concatenate(
                [bidx[..., None], jax.lax.stop_gradient(boxes)], -1)
            rf = multilevel_roi_align(feats[:4], rois.reshape(B * N, 5),
                                      strides=self.featmap_strides)
            s = rf.shape[1]
            rf = rf.reshape(B, N, s * s, -1)
            cls, deltas, pf = stage(rf, pf)
            boxes = delta_decode(jax.lax.stop_gradient(boxes), deltas,
                                 stds=self.stage_stds)
            outs.append((cls, boxes))
        return outs

    def __call__(self, images, train: bool = False):
        return self._run_stages(images, train)[-1]

    def _stage_loss(self, cls, boxes, gt_boxes, gt_labels, gt_valid, scale):
        B, N, _ = cls.shape
        G = gt_boxes.shape[1]
        prob = jax.nn.sigmoid(cls)
        pg = jnp.take_along_axis(
            prob[:, :, None, :].repeat(G, 2),
            jnp.clip(gt_labels, 0, self.num_classes - 1)[
                :, None, :, None].repeat(N, 1), -1)[..., 0]   # (B, N, G)
        cost_cls = -pg
        bn = boxes / scale[:, None, :]
        gn = gt_boxes / scale[:, None, :]
        cost_l1 = jnp.abs(bn[:, :, None, :] - gn[:, None, :, :]).sum(-1)
        iou = jax.vmap(bbox_overlaps)(boxes, gt_boxes)        # (B, N, G)?
        # bbox_overlaps(a, b) -> (Na, Nb); vmap gives (B, N, G)
        cost = (self.cls_weight * cost_cls + self.bbox_weight * cost_l1
                - self.giou_weight * iou)
        cost = jnp.where(gt_valid[:, None, :], cost, 1e6)
        assign = hungarian_match(jax.lax.stop_gradient(cost))
        matched = jnp.take_along_axis(gt_valid, jnp.clip(assign, 0),
                                      1) & (assign >= 0)
        gidx = jnp.clip(assign, 0)
        labels = jnp.where(matched,
                           jnp.take_along_axis(gt_labels, gidx, 1),
                           self.num_classes)
        tgt = jax.lax.stop_gradient(jnp.take_along_axis(
            gt_boxes, gidx[..., None].repeat(4, -1), 1))
        n_pos = jnp.maximum(matched.sum(), 1.0)
        wf = matched.astype(jnp.float32)
        l_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                          avg_factor=n_pos)
        l_l1 = losses.l1_loss(bn, jax.lax.stop_gradient(
            tgt / scale[:, None, :]), weight=wf[..., None],
            avg_factor=n_pos)
        l_giou = losses.giou_loss(boxes, tgt, weight=wf, avg_factor=n_pos)
        return (self.cls_weight * l_cls, self.bbox_weight * l_l1,
                self.giou_weight * l_giou)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        outs = self._run_stages(images, train=True)
        scale = jnp.stack([img_shapes[:, 1], img_shapes[:, 0],
                           img_shapes[:, 1], img_shapes[:, 0]], -1)
        result: Dict[str, jnp.ndarray] = {}
        for si, (cls, boxes) in enumerate(outs):
            lc, lb, lg = self._stage_loss(cls, boxes, gt_boxes, gt_labels,
                                          gt_valid, scale)
            tag = "" if si == len(outs) - 1 else f"s{si}."
            result[f"{tag}loss_cls"] = lc
            result[f"{tag}loss_bbox"] = lb
            result[f"{tag}loss_giou"] = lg
        return result

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, max_per_img=100, score_thr=0.0) -> DetResult:
        cls, boxes = self(images, train=False)
        B, N, C = cls.shape
        prob = jax.nn.sigmoid(cls)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        flat = prob.reshape(B, -1)
        k = min(max_per_img, flat.shape[1])
        top_s, top_i = jax.lax.top_k(flat, k)
        pi = top_i // C
        li = (top_i % C).astype(jnp.int32)
        bx = jnp.take_along_axis(boxes, pi[..., None].repeat(4, -1), 1)
        if scale_factors is not None:
            bx = bx / scale_factors[:, None, :]
        mask = top_s > score_thr
        return DetResult(bx, jnp.where(mask, top_s, NEG_INF),
                         jnp.where(mask, li, -1), mask)
