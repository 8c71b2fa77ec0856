"""RepPoints detector (`mmdet/models/dense_heads/reppoints_head.py` +
`detectors/reppoints_detector.py`): each location predicts a set of 9
representative points; a deformable conv sampled AT those points produces the
classification and the point refinement; boxes come from the points via the
moment transform (mean +/- std * exp(learned moment transfer)).

Two-stage point training: the init stage is assigned by nearest-point
(`core.assigner.point_assign`), the refine stage by IoU of the init-stage
pseudo boxes.  The init points feed the DCN offsets with gradient_mul=0.1
(mostly detached), exactly the reference's trick to keep sampling stable.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..core.assigner import point_assign, max_iou_assign
from ..core.bbox import bbox_overlaps
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import batched_nms, NEG_INF, DetResult
from .layers import resolve_dtype
from .registry import BACKBONES, NECKS, DETECTORS, HEADS, build

NUM_POINTS = 9


def moment_points2bbox(pts: jnp.ndarray, moment_transfer: jnp.ndarray,
                       moment_mul: float = 0.01) -> jnp.ndarray:
    """pts (..., 9, 2) as (dy, dx) -> xyxy boxes (..., 4)
    (`reppoints_head.py points2bbox`, transform_method='moment')."""
    mt = (moment_transfer * moment_mul
          + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
    y, x = pts[..., 0], pts[..., 1]
    ym = y.mean(-1, keepdims=True)
    xm = x.mean(-1, keepdims=True)
    # torch.std: unbiased (ddof=1)
    n = pts.shape[-2]
    ystd = jnp.sqrt(((y - ym) ** 2).sum(-1, keepdims=True) / (n - 1) + 1e-12)
    xstd = jnp.sqrt(((x - xm) ** 2).sum(-1, keepdims=True) / (n - 1) + 1e-12)
    hw = xstd * jnp.exp(mt[0])
    hh = ystd * jnp.exp(mt[1])
    return jnp.concatenate([xm - hw, ym - hh, xm + hw, ym + hh], -1)


def minmax_points2bbox(pts: jnp.ndarray, partial: bool = False) -> jnp.ndarray:
    """transform_method='minmax' / 'partial_minmax'
    (`reppoints_head.py points2bbox`): box = extremes of the point set
    (first 4 points only for partial).  Also serves the grid-point bbox
    variants (configs/reppoints/bbox_r50_grid_*)."""
    if partial:
        pts = pts[..., :4, :]
    y, x = pts[..., 0], pts[..., 1]
    return jnp.stack([x.min(-1), y.min(-1), x.max(-1), y.max(-1)], -1)


def gen_grid_from_reg(reg: jnp.ndarray, prev_boxes: jnp.ndarray):
    """`reppoints_head.py gen_grid_from_reg` (use_grid_points=True): reg
    (..., 4) = (dx, dy, log dw, log dh) relative to prev_boxes (..., 4)
    xyxy; returns a regular 3x3 point grid (..., 18) as (dy, dx) pairs on
    the regressed box, plus the box itself."""
    bxy = (prev_boxes[..., :2] + prev_boxes[..., 2:]) / 2.0
    bwh = jnp.maximum(prev_boxes[..., 2:] - prev_boxes[..., :2], 1e-6)
    wh = bwh * jnp.exp(reg[..., 2:])
    topleft = bxy + bwh * reg[..., :2] - 0.5 * wh
    frac = jnp.linspace(0.0, 1.0, 3)
    # row-major 3x3 grid matching _dcn_base tap order: (dy, dx) per tap
    gy = topleft[..., 1:2] + wh[..., 1:2] * frac          # (..., 3)
    gx = topleft[..., 0:1] + wh[..., 0:1] * frac
    yy = jnp.repeat(gy, 3, axis=-1)                       # y0 y0 y0 y1 ...
    xx = jnp.tile(gx, (1,) * (gx.ndim - 1) + (3,))        # x0 x1 x2 x0 ...
    pts = jnp.stack([yy, xx], -1).reshape(reg.shape[:-1] + (2 * NUM_POINTS,))
    box = jnp.concatenate([topleft, topleft + wh], -1)
    return pts, box


def _dcn_base() -> np.ndarray:
    """Regular 3x3 tap grid as (dy, dx) pairs, matching deform_conv2d's tap
    order."""
    base = []
    for ki in range(NUM_POINTS):
        base.extend([ki // 3 - 1, ki % 3 - 1])
    return np.asarray(base, np.float32)


@HEADS.register
class RepPointsHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    gradient_mul: float = 0.1
    # bbox_r50_grid_* configs: predict a box per stage and place a regular
    # 3x3 grid on it instead of free-form point offsets
    use_grid_points: bool = False
    point_base_scale: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        dt = resolve_dtype(self.dtype)
        out_dim = 4 if self.use_grid_points else 2 * NUM_POINTS
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"cls_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"cls_gn{i}"))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=dt,
                              name=f"reg_conv{i}"),
                      nn.GroupNorm(num_groups=32, name=f"reg_gn{i}"))
                     for i in range(self.stacked_convs)]
        init_conv = nn.Conv(self.point_feat_channels, (3, 3), padding=1,
                            dtype=dt, name="pts_init_conv")
        init_out = nn.Conv(out_dim, (1, 1), dtype=dt,
                           name="pts_init_out")
        cls_dcn_w = self.param("cls_dcn_kernel", nn.initializers.he_normal(),
                               (NUM_POINTS, self.feat_channels,
                                self.point_feat_channels))
        cls_out = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          bias_init=nn.initializers.constant(-4.595),
                          name="cls_out")
        refine_dcn_w = self.param("refine_dcn_kernel",
                                  nn.initializers.he_normal(),
                                  (NUM_POINTS, self.feat_channels,
                                   self.point_feat_channels))
        refine_out = nn.Conv(out_dim, (1, 1), dtype=dt,
                             name="pts_refine_out")
        base = jnp.asarray(_dcn_base())
        scale = self.point_base_scale / 2.0
        bbox_init = jnp.asarray([-scale, -scale, scale, scale], jnp.float32)
        cls_l, init_l, refine_l = [], [], []
        for f in feats:
            c = r = f if dt is None else f.astype(dt)
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            pts_init = init_out(nn.relu(init_conv(r))).astype(jnp.float32)
            if self.use_grid_points:
                pts_init, bbox_out = gen_grid_from_reg(
                    pts_init, jnp.broadcast_to(bbox_init,
                                               pts_init.shape[:-1] + (4,)))
            pts_gm = (self.gradient_mul * pts_init
                      + (1 - self.gradient_mul)
                      * jax.lax.stop_gradient(pts_init))
            dcn_off = pts_gm - base
            cls = cls_out(nn.relu(deform_conv2d(
                c.astype(jnp.float32), dcn_off, cls_dcn_w.astype(jnp.float32))))
            refine = refine_out(nn.relu(deform_conv2d(
                r.astype(jnp.float32), dcn_off,
                refine_dcn_w.astype(jnp.float32)))).astype(jnp.float32)
            if self.use_grid_points:
                refine, _ = gen_grid_from_reg(
                    refine, jax.lax.stop_gradient(bbox_out))
            else:
                refine = refine + jax.lax.stop_gradient(pts_init)
            cls_l.append(cls.astype(jnp.float32))
            init_l.append(pts_init)
            refine_l.append(refine)
        return tuple(cls_l), tuple(init_l), tuple(refine_l)


@DETECTORS.register
class RepPointsDetector(nn.Module):
    backbone: Any
    num_classes: int = 80
    neck: Optional[Any] = None
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: int = 4
    # 'moment' | 'minmax' | 'partial_minmax' (`points2bbox` transform;
    # minmax also serves the grid-point bbox_r50_grid_* configs)
    transform_method: str = "moment"
    use_grid_points: bool = False
    # bbox_r50_grid_* swap the init-stage point assigner for MaxIoU over
    # the base boxes (point_base_scale * stride squares at each center)
    init_assigner: str = "point"
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        neck_cfg = dict(self.neck or {
            "type": "FPN", "in_channels": (512, 1024, 2048),
            "out_channels": 256, "num_outs": 5, "start_level": 1,
            "add_extra_convs": True})
        self.neck_m = build(NECKS, neck_cfg)
        self.head_m = RepPointsHead(num_classes=self.num_classes,
                                    use_grid_points=self.use_grid_points,
                                    point_base_scale=self.point_base_scale,
                                    dtype=self.compute_dtype)
        self.moment_transfer = self.param(
            "moment_transfer", nn.initializers.zeros, (2,))

    def __call__(self, images, train: bool = False):
        feats = self.neck_m(self.backbone_m(images, train=train))
        return self.head_m(feats)

    def _flatten(self, cls_l, init_l, refine_l):
        """Concat levels -> flat (B, N, ...) plus per-anchor centers/strides
        in image coordinates and decoded init/refine boxes."""
        B = cls_l[0].shape[0]
        cls, initb, refineb, centers, strides = [], [], [], [], []
        for li, (c, pi, pr) in enumerate(zip(cls_l, init_l, refine_l)):
            H, W = c.shape[1:3]
            s = float(self.point_strides[li])
            ys = jnp.arange(H, dtype=jnp.float32) * s
            xs = jnp.arange(W, dtype=jnp.float32) * s
            ctr = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy")[::1],
                            -1).reshape(-1, 2)                     # (HW, 2) xy
            pi_pts = pi.reshape(B, H * W, NUM_POINTS, 2) * s
            pr_pts = pr.reshape(B, H * W, NUM_POINTS, 2) * s
            if self.transform_method == "moment":
                bi = moment_points2bbox(pi_pts, self.moment_transfer)
                br = moment_points2bbox(pr_pts, self.moment_transfer)
            else:
                partial = self.transform_method == "partial_minmax"
                bi = minmax_points2bbox(pi_pts, partial)
                br = minmax_points2bbox(pr_pts, partial)
            off = jnp.stack([ctr[:, 0], ctr[:, 1], ctr[:, 0], ctr[:, 1]], -1)
            initb.append(bi + off[None])
            refineb.append(br + off[None])
            cls.append(c.reshape(B, -1, self.num_classes))
            centers.append(ctr)
            strides.append(jnp.full((H * W,), s))
        return (jnp.concatenate(cls, 1), jnp.concatenate(initb, 1),
                jnp.concatenate(refineb, 1), jnp.concatenate(centers, 0),
                jnp.concatenate(strides, 0))

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        cls_l, init_l, refine_l = self(images, train=True)
        cls, initb, refineb, centers, strides = self._flatten(
            cls_l, init_l, refine_l)
        norm = (strides * self.point_base_scale)[None, :, None]

        def single(init_boxes, gts, glabels, gvalid):
            if self.init_assigner == "max_iou":
                half = strides * self.point_base_scale / 2.0
                base_boxes = jnp.stack(
                    [centers[:, 0] - half, centers[:, 1] - half,
                     centers[:, 0] + half, centers[:, 1] + half], -1)
                a_init, _ = max_iou_assign(
                    bbox_overlaps(gts, base_boxes), gvalid,
                    pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0)
            else:
                a_init = point_assign(centers, strides, gts, gvalid,
                                      scale=self.point_base_scale, pos_num=1)
            pos_i = a_init > 0
            tgt_i = gts[jnp.clip(a_init - 1, 0)]
            ious = bbox_overlaps(gts, jax.lax.stop_gradient(init_boxes))
            a_ref, _ = max_iou_assign(ious, gvalid, pos_iou_thr=0.5,
                                      neg_iou_thr=0.4)
            pos_r = a_ref > 0
            gidx_r = jnp.clip(a_ref - 1, 0)
            labels = jnp.where(pos_r, glabels[gidx_r], self.num_classes)
            tgt_r = gts[gidx_r]
            return pos_i, tgt_i, pos_r, labels, tgt_r

        pos_i, tgt_i, pos_r, labels, tgt_r = jax.vmap(single)(
            initb, gt_boxes, gt_labels, gt_valid)
        tgt_i = jax.lax.stop_gradient(tgt_i)
        tgt_r = jax.lax.stop_gradient(tgt_r)
        n_i = jnp.maximum(pos_i.sum(), 1.0)
        n_r = jnp.maximum(pos_r.sum(), 1.0)
        loss_cls = losses.sigmoid_focal_loss(cls, labels, self.num_classes,
                                             avg_factor=n_r)
        wi = pos_i.astype(jnp.float32)[..., None].repeat(4, -1)
        wr = pos_r.astype(jnp.float32)[..., None].repeat(4, -1)
        loss_init = 0.5 * losses.smooth_l1_loss(
            initb / norm, tgt_i / norm, beta=0.11, weight=wi,
            avg_factor=4 * n_i)
        loss_refine = losses.smooth_l1_loss(
            refineb / norm, tgt_r / norm, beta=0.11, weight=wr,
            avg_factor=4 * n_r)
        return {"loss_cls": loss_cls, "loss_pts_init": loss_init,
                "loss_pts_refine": loss_refine}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, nms_pre=1000, score_thr=0.05, iou_threshold=0.5,
                    max_per_img=100) -> DetResult:
        cls_l, init_l, refine_l = self(images, train=False)
        cls, _, boxes, _, _ = self._flatten(cls_l, init_l, refine_l)
        B = images.shape[0]
        prob = jax.nn.sigmoid(cls)
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
