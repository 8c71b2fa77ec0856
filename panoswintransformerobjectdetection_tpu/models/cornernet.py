"""CornerNet (`mmdet/models/dense_heads/corner_head.py` +
`detectors/cornernet.py`): keypoint-based detection — top-left and
bottom-right corner heatmaps (gaussian targets), associative embeddings to
pair corners of the same object, and sub-pixel offsets.

TPU notes: corner pooling is `ops.corner_pool` (cummax scans); gaussian
targets are drawn as a max over per-gt closed-form maps (no host loop);
decoding is a dense 100x100 corner pairing with validity masks instead of
the reference's index juggling — all static shapes.
"""

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import losses
from ..ops.corner_pool import corner_pool
from ..ops.nms import DetResult, NEG_INF
from .layers import resolve_dtype
from .registry import BACKBONES, DETECTORS, HEADS, build


def gaussian_radius(h, w, min_overlap=0.3):
    """Smallest corner-displacement radius keeping IoU >= min_overlap
    (`mmdet/models/utils/gaussian_target.py:66`, three Vieta cases)."""
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.clip(b1 ** 2 - 4 * c1, 0))) / 2
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.clip(b2 ** 2 - 16 * c2, 0))) / 8
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (-b3 + jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians(H, W, cx, cy, radius, valid):
    """Max-combined per-gt gaussian heatmaps -> (H, W).  cx/cy/radius: (G,)
    in feature coordinates."""
    sigma = jnp.maximum((2 * radius + 1) / 6.0, 1e-3)
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    d2 = ((xs[None, None, :] - cx[:, None, None]) ** 2
          + (ys[None, :, None] - cy[:, None, None]) ** 2)
    g = jnp.exp(-d2 / (2 * sigma[:, None, None] ** 2))
    g = jnp.where(valid[:, None, None], g, 0.0)
    return g.max(0)


class _CornerBranch(nn.Module):
    """Corner pooling block + heat/offset/embedding heads for one corner."""
    num_classes: int
    directions: Tuple[str, str]
    feat_channels: int = 256

    @nn.compact
    def __call__(self, x):
        d1 = nn.relu(nn.Conv(128, (3, 3), padding=1, name="p1_conv")(x))
        d2 = nn.relu(nn.Conv(128, (3, 3), padding=1, name="p2_conv")(x))
        pooled = (corner_pool(d1, self.directions[0])
                  + corner_pool(d2, self.directions[1]))
        p = nn.Conv(self.feat_channels, (3, 3), padding=1,
                    name="p_conv")(pooled)
        skip = nn.Conv(self.feat_channels, (1, 1), name="skip_conv")(x)
        feat = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                               name="out_conv")(nn.relu(p + skip)))
        heat = nn.Conv(self.num_classes, (1, 1),
                       bias_init=nn.initializers.constant(-2.19),
                       name="heat_out")(
            nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            name="heat_conv")(feat)))
        off = nn.Conv(2, (1, 1), name="off_out")(
            nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            name="off_conv")(feat)))
        emb = nn.Conv(1, (1, 1), name="emb_out")(
            nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            name="emb_conv")(feat)))
        return heat, off, emb[..., 0]


@HEADS.register
class CornerHead(nn.Module):
    num_classes: int = 80

    @nn.compact
    def __call__(self, feats):
        """feats: per-stack list from HourglassNet.  Returns per-stack
        (tl_heat, tl_off, tl_emb, br_heat, br_off, br_emb)."""
        outs = []
        for si, f in enumerate(feats):
            tl = _CornerBranch(self.num_classes, ("top", "left"),
                               name=f"tl_{si}")(f)
            br = _CornerBranch(self.num_classes, ("bottom", "right"),
                               name=f"br_{si}")(f)
            outs.append(tl + br)
        return tuple(outs)


@DETECTORS.register
class CornerNet(nn.Module):
    backbone: Any
    num_classes: int = 80
    stride: int = 4
    corner_topk: int = 100
    distance_threshold: float = 0.5
    compute_dtype: Any = None

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        self.head_m = CornerHead(num_classes=self.num_classes)

    def __call__(self, images, train: bool = False):
        return self.head_m(self.backbone_m(images, train=train))

    def _targets(self, H, W, gt_boxes, gt_labels, gt_valid):
        """Per-image per-class corner heatmaps + corner positions."""
        g = gt_boxes / self.stride

        def one(gts, glabels, gvalid):
            w = jnp.clip(gts[:, 2] - gts[:, 0], 0)
            h = jnp.clip(gts[:, 3] - gts[:, 1], 0)
            rad = jnp.clip(gaussian_radius(h, w), 0)
            tlx = jnp.clip(gts[:, 0], 0, W - 1)
            tly = jnp.clip(gts[:, 1], 0, H - 1)
            brx = jnp.clip(gts[:, 2], 0, W - 1)
            bry = jnp.clip(gts[:, 3], 0, H - 1)

            def per_gt_maps(cx, cy):
                sigma = jnp.maximum((2 * rad + 1) / 6.0, 1e-3)
                xs = jnp.arange(W, dtype=jnp.float32)
                ys = jnp.arange(H, dtype=jnp.float32)
                d2 = ((xs[None, None, :] - cx[:, None, None]) ** 2
                      + (ys[None, :, None] - cy[:, None, None]) ** 2)
                gm = jnp.exp(-d2 / (2 * sigma[:, None, None] ** 2))
                return jnp.where(gvalid[:, None, None], gm, 0.0)  # (G,H,W)

            # per-class max via segment_max over the gt axis (avoids a
            # (C, G, H, W) intermediate)
            seg = jnp.clip(glabels, 0, self.num_classes - 1)

            def to_class_heat(gm):
                h = jax.ops.segment_max(gm, seg,
                                        num_segments=self.num_classes)
                return jnp.maximum(h, 0.0).transpose(1, 2, 0)    # (H,W,C)

            tl_h = to_class_heat(per_gt_maps(tlx, tly))
            br_h = to_class_heat(per_gt_maps(brx, bry))
            return tl_h, br_h, tlx, tly, brx, bry

        return jax.vmap(one)(g, gt_labels, gt_valid)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        stacks = self(images, train=True)
        H, W = stacks[0][0].shape[1:3]
        tl_t, br_t, tlx, tly, brx, bry = self._targets(
            H, W, gt_boxes, gt_labels, gt_valid)
        tl_t = jax.lax.stop_gradient(tl_t)
        br_t = jax.lax.stop_gradient(br_t)
        ix_tl = jnp.clip(tlx.astype(jnp.int32), 0, W - 1)
        iy_tl = jnp.clip(tly.astype(jnp.int32), 0, H - 1)
        ix_br = jnp.clip(brx.astype(jnp.int32), 0, W - 1)
        iy_br = jnp.clip(bry.astype(jnp.int32), 0, H - 1)
        off_tl_t = jnp.stack([tlx - ix_tl, tly - iy_tl], -1)   # (B, G, 2)
        off_br_t = jnp.stack([brx - ix_br, bry - iy_br], -1)
        n_pos = jnp.maximum(gt_valid.sum(), 1.0)
        wv = gt_valid.astype(jnp.float32)

        def gather_bg(maps, iy, ix):
            """maps (B, H, W, ...) at per-image gt pixels -> (B, G, ...)."""
            return jax.vmap(lambda m, y, x: m[y, x])(maps, iy, ix)

        out: Dict[str, jnp.ndarray] = {}
        ld, lo, lp, lu = 0.0, 0.0, 0.0, 0.0
        for (tl_heat, tl_off, tl_emb, br_heat, br_off, br_emb) in stacks:
            ld = ld + (losses.gaussian_focal_loss(
                jax.nn.sigmoid(tl_heat), tl_t, avg_factor=n_pos)
                + losses.gaussian_focal_loss(
                    jax.nn.sigmoid(br_heat), br_t, avg_factor=n_pos))
            po_tl = gather_bg(tl_off, iy_tl, ix_tl)
            po_br = gather_bg(br_off, iy_br, ix_br)
            lo = lo + (losses.smooth_l1_loss(
                po_tl, off_tl_t, weight=wv[..., None],
                avg_factor=2 * n_pos)
                + losses.smooth_l1_loss(
                    po_br, off_br_t, weight=wv[..., None],
                    avg_factor=2 * n_pos))
            e_tl = gather_bg(tl_emb, iy_tl, ix_tl)          # (B, G)
            e_br = gather_bg(br_emb, iy_br, ix_br)
            m = (e_tl + e_br) / 2
            pull = (((e_tl - m) ** 2 + (e_br - m) ** 2) * wv).sum() / n_pos
            dist = jnp.abs(m[:, :, None] - m[:, None, :])
            pair_w = (wv[:, :, None] * wv[:, None, :] *
                      (1 - jnp.eye(m.shape[1])[None]))
            n_pair = jnp.maximum(pair_w.sum(), 1.0)
            push = (jnp.clip(1 - dist, 0) * pair_w).sum() / n_pair
            lp = lp + pull
            lu = lu + push
        k = float(len(stacks))
        return {"loss_heatmap": ld / k, "loss_offset": lo / k,
                "loss_pull": 0.25 * lp / k, "loss_push": 0.25 * lu / k}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, max_per_img=100, score_thr=0.05) -> DetResult:
        stacks = self(images, train=False)
        tl_heat, tl_off, tl_emb, br_heat, br_off, br_emb = stacks[-1]
        B, H, W, C = tl_heat.shape
        K = self.corner_topk

        def corners(heat, off, emb):
            p = jax.nn.sigmoid(heat)
            # 3x3 local-max suppression (reference get_local_maximum)
            mx = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
            p = jnp.where(p == mx, p, 0.0)
            flat = p.reshape(B, -1)
            s, idx = jax.lax.top_k(flat, K)
            cls = (idx % C).astype(jnp.int32)
            pix = idx // C
            y = (pix // W).astype(jnp.float32)
            x = (pix % W).astype(jnp.float32)
            oxy = jax.vmap(lambda o, iy, ix: o[iy, ix])(
                off, (pix // W), (pix % W))
            e = jax.vmap(lambda o, iy, ix: o[iy, ix])(
                emb, (pix // W), (pix % W))
            return s, cls, (x + oxy[..., 0]) * self.stride, \
                (y + oxy[..., 1]) * self.stride, e

        s_tl, c_tl, x_tl, y_tl, e_tl = corners(tl_heat, tl_off, tl_emb)
        s_br, c_br, x_br, y_br, e_br = corners(br_heat, br_off, br_emb)
        # dense pairing (B, K, K)
        score = (s_tl[:, :, None] + s_br[:, None, :]) / 2
        ok = ((c_tl[:, :, None] == c_br[:, None, :]) &
              (jnp.abs(e_tl[:, :, None] - e_br[:, None, :])
               < self.distance_threshold) &
              (x_br[:, None, :] > x_tl[:, :, None]) &
              (y_br[:, None, :] > y_tl[:, :, None]))
        score = jnp.where(ok, score, NEG_INF)
        flat = score.reshape(B, -1)
        top_s, top_i = jax.lax.top_k(flat, max_per_img)
        ti = top_i // K
        bi = top_i % K
        boxes = jnp.stack([jnp.take_along_axis(x_tl, ti, 1),
                           jnp.take_along_axis(y_tl, ti, 1),
                           jnp.take_along_axis(x_br, bi, 1),
                           jnp.take_along_axis(y_br, bi, 1)], -1)
        labels = jnp.take_along_axis(c_tl, ti, 1)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        mask = top_s > score_thr
        return DetResult(boxes, jnp.where(mask, top_s, NEG_INF),
                         jnp.where(mask, labels, -1), mask)


class _CentripetalBranch(nn.Module):
    """Corner branch + centripetal-shift head (embedding replaced by a
    2-vector pointing from the corner toward the box center)."""
    num_classes: int
    directions: Tuple[str, str]
    feat_channels: int = 256

    @nn.compact
    def __call__(self, x):
        base = _CornerBranch(self.num_classes, self.directions,
                             self.feat_channels, name="corner")
        heat, off, _ = base(x)
        shift = nn.Conv(2, (1, 1), name="shift_out")(
            nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                            name="shift_conv")(x)))
        return heat, off, shift


@HEADS.register
class CentripetalHead(nn.Module):
    """`mmdet/models/dense_heads/centripetal_head.py`: CornerHead whose
    corners are paired by agreement of their predicted centripetal shifts
    (corner + shift ≈ box center) instead of associative embeddings."""
    num_classes: int = 80

    @nn.compact
    def __call__(self, feats):
        outs = []
        for si, f in enumerate(feats):
            tl = _CentripetalBranch(self.num_classes, ("top", "left"),
                                    name=f"tl_{si}")(f)
            br = _CentripetalBranch(self.num_classes, ("bottom", "right"),
                                    name=f"br_{si}")(f)
            outs.append(tl + br)
        return tuple(outs)


@DETECTORS.register
class CentripetalNet(CornerNet):
    """CornerNet orchestration with the centripetal head; pairing accepts a
    (tl, br) pair when both predicted centers fall inside the central
    region of the candidate box."""
    center_region: float = 0.5

    def setup(self):
        self.backbone_m = build(BACKBONES, dict(self.backbone))
        self.head_m = CentripetalHead(num_classes=self.num_classes)

    def forward_train(self, images, img_shapes, gt_boxes, gt_labels,
                      gt_valid) -> Dict[str, jnp.ndarray]:
        stacks = self(images, train=True)
        H, W = stacks[0][0].shape[1:3]
        tl_t, br_t, tlx, tly, brx, bry = self._targets(
            H, W, gt_boxes, gt_labels, gt_valid)
        tl_t = jax.lax.stop_gradient(tl_t)
        br_t = jax.lax.stop_gradient(br_t)
        ix_tl = jnp.clip(tlx.astype(jnp.int32), 0, W - 1)
        iy_tl = jnp.clip(tly.astype(jnp.int32), 0, H - 1)
        ix_br = jnp.clip(brx.astype(jnp.int32), 0, W - 1)
        iy_br = jnp.clip(bry.astype(jnp.int32), 0, H - 1)
        cx = (tlx + brx) / 2
        cy = (tly + bry) / 2
        # shift targets: corner pixel -> center, in feature units
        sh_tl_t = jnp.stack([cx - ix_tl, cy - iy_tl], -1)
        sh_br_t = jnp.stack([cx - ix_br, cy - iy_br], -1)
        off_tl_t = jnp.stack([tlx - ix_tl, tly - iy_tl], -1)
        off_br_t = jnp.stack([brx - ix_br, bry - iy_br], -1)
        n_pos = jnp.maximum(gt_valid.sum(), 1.0)
        wv = gt_valid.astype(jnp.float32)

        def gather_bg(maps, iy, ix):
            return jax.vmap(lambda m, y, x: m[y, x])(maps, iy, ix)

        ld, lo, ls = 0.0, 0.0, 0.0
        for (tl_heat, tl_off, tl_shift, br_heat, br_off, br_shift) in stacks:
            ld = ld + (losses.gaussian_focal_loss(
                jax.nn.sigmoid(tl_heat), tl_t, avg_factor=n_pos)
                + losses.gaussian_focal_loss(
                    jax.nn.sigmoid(br_heat), br_t, avg_factor=n_pos))
            lo = lo + (losses.smooth_l1_loss(
                gather_bg(tl_off, iy_tl, ix_tl), off_tl_t,
                weight=wv[..., None], avg_factor=2 * n_pos)
                + losses.smooth_l1_loss(
                    gather_bg(br_off, iy_br, ix_br), off_br_t,
                    weight=wv[..., None], avg_factor=2 * n_pos))
            ls = ls + (losses.smooth_l1_loss(
                gather_bg(tl_shift, iy_tl, ix_tl),
                jnp.log1p(jnp.clip(sh_tl_t, 0)), weight=wv[..., None],
                avg_factor=2 * n_pos)
                + losses.smooth_l1_loss(
                    gather_bg(br_shift, iy_br, ix_br),
                    -jnp.log1p(jnp.clip(-sh_br_t, 0)),
                    weight=wv[..., None], avg_factor=2 * n_pos))
        k = float(len(stacks))
        return {"loss_heatmap": ld / k, "loss_offset": lo / k,
                "loss_centripetal_shift": ls / k}

    def simple_test(self, images, img_shapes, scale_factors=None,
                    *, max_per_img=100, score_thr=0.05) -> DetResult:
        stacks = self(images, train=False)
        tl_heat, tl_off, tl_shift, br_heat, br_off, br_shift = stacks[-1]
        B, H, W, C = tl_heat.shape
        K = self.corner_topk

        def corners(heat, off, shift, sign):
            p = jax.nn.sigmoid(heat)
            mx = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
            p = jnp.where(p == mx, p, 0.0)
            flat = p.reshape(B, -1)
            s, idx = jax.lax.top_k(flat, K)
            cls = (idx % C).astype(jnp.int32)
            pix = idx // C
            y = (pix // W).astype(jnp.float32)
            x = (pix % W).astype(jnp.float32)
            oxy = jax.vmap(lambda o, iy, ix: o[iy, ix])(off, pix // W,
                                                        pix % W)
            sxy = jax.vmap(lambda o, iy, ix: o[iy, ix])(shift, pix // W,
                                                        pix % W)
            # invert the log1p shift encoding
            ctr_x = x + sign * jnp.expm1(jnp.abs(sxy[..., 0]))
            ctr_y = y + sign * jnp.expm1(jnp.abs(sxy[..., 1]))
            return (s, cls, (x + oxy[..., 0]) * self.stride,
                    (y + oxy[..., 1]) * self.stride,
                    ctr_x * self.stride, ctr_y * self.stride)

        s_tl, c_tl, x_tl, y_tl, cx_tl, cy_tl = corners(tl_heat, tl_off,
                                                       tl_shift, +1.0)
        s_br, c_br, x_br, y_br, cx_br, cy_br = corners(br_heat, br_off,
                                                       br_shift, -1.0)
        score = (s_tl[:, :, None] + s_br[:, None, :]) / 2
        bx1 = x_tl[:, :, None]
        by1 = y_tl[:, :, None]
        bx2 = x_br[:, None, :]
        by2 = y_br[:, None, :]
        bcx = (bx1 + bx2) / 2
        bcy = (by1 + by2) / 2
        half_w = (bx2 - bx1) * self.center_region / 2
        half_h = (by2 - by1) * self.center_region / 2
        ok = ((c_tl[:, :, None] == c_br[:, None, :]) &
              (bx2 > bx1) & (by2 > by1) &
              (jnp.abs(cx_tl[:, :, None] - bcx) <= half_w) &
              (jnp.abs(cy_tl[:, :, None] - bcy) <= half_h) &
              (jnp.abs(cx_br[:, None, :] - bcx) <= half_w) &
              (jnp.abs(cy_br[:, None, :] - bcy) <= half_h))
        score = jnp.where(ok, score, NEG_INF)
        flat = score.reshape(B, -1)
        top_s, top_i = jax.lax.top_k(flat, max_per_img)
        ti = top_i // K
        bi = top_i % K
        boxes = jnp.stack([jnp.take_along_axis(x_tl, ti, 1),
                           jnp.take_along_axis(y_tl, ti, 1),
                           jnp.take_along_axis(x_br, bi, 1),
                           jnp.take_along_axis(y_br, bi, 1)], -1)
        labels = jnp.take_along_axis(c_tl, ti, 1)
        h = img_shapes[:, 0][:, None, None]
        w = img_shapes[:, 1][:, None, None]
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
        if scale_factors is not None:
            boxes = boxes / scale_factors[:, None, :]
        mask = top_s > score_thr
        return DetResult(boxes, jnp.where(mask, top_s, NEG_INF),
                         jnp.where(mask, labels, -1), mask)
