"""Box coder classes (`mmdet/core/bbox/coder/`).

Config-buildable encode/decode pairs for custom heads.  The in-tree heads
call the underlying functions (`core.bbox.delta_encode/decode`,
`core.bbox.distance2bbox/bbox2distance`) directly — these classes exist so
reference-style `bbox_coder=dict(type=...)` configs and user code keep
working.
"""

from typing import Optional, Sequence

import jax.numpy as jnp

from .bbox import (delta_encode, delta_decode, clip_boxes,
                   distance2bbox, bbox2distance)


class BaseBBoxCoder:
    """Interface marker (`base_bbox_coder.py`)."""


class DeltaXYWHBBoxCoder(BaseBBoxCoder):
    """`delta_xywh_bbox_coder.py:10`: (dx, dy, dw, dh) deltas with
    mean/std normalization.

    Example:
        >>> import jax.numpy as jnp
        >>> coder = DeltaXYWHBBoxCoder()
        >>> rois = jnp.array([[0., 0., 10., 10.]])
        >>> gts = jnp.array([[2., 2., 12., 12.]])
        >>> d = coder.encode(rois, gts)
        >>> coder.decode(rois, d).round(4).tolist()  # exact roundtrip
        [[2.0, 2.0, 12.0, 12.0]]
    """

    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.), clip_border: bool = True):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)
        self.clip_border = clip_border

    def encode(self, bboxes, gt_bboxes):
        return delta_encode(bboxes, gt_bboxes, means=self.means,
                            stds=self.stds)

    def decode(self, bboxes, pred_bboxes, max_shape=None, wh_ratio_clip=None):
        out = delta_decode(bboxes, pred_bboxes, means=self.means,
                           stds=self.stds)
        if self.clip_border and max_shape is not None:
            out = clip_boxes(out, max_shape)
        return out


class PseudoBBoxCoder(BaseBBoxCoder):
    """`pseudo_bbox_coder.py`: identity (DETR-style heads regress boxes
    directly)."""

    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        return pred_bboxes


class TBLRBBoxCoder(BaseBBoxCoder):
    """`tblr_bbox_coder.py`: (top, bottom, left, right) distances from the
    prior center, optionally normalized by prior h/w, then by
    `normalizer` (FSAF's coder)."""

    def __init__(self, normalizer=4.0, clip_border: bool = True,
                 normalize_by_wh: bool = True):
        self.normalizer = normalizer
        self.clip_border = clip_border
        self.normalize_by_wh = normalize_by_wh

    def _norm(self, dtype):
        n = self.normalizer
        if isinstance(n, (int, float)):
            return jnp.full((4,), float(n), dtype)
        n = jnp.asarray(n, dtype)
        assert n.shape[-1] == 4, "normalizer must have length 4"
        return n

    def encode(self, bboxes, gt_bboxes):
        """bboxes2tblr (`tblr_bbox_coder.py:76`)."""
        c = (bboxes[..., 0:2] + bboxes[..., 2:4]) / 2
        top = c[..., 1] - gt_bboxes[..., 1]
        bottom = gt_bboxes[..., 3] - c[..., 1]
        left = c[..., 0] - gt_bboxes[..., 0]
        right = gt_bboxes[..., 2] - c[..., 0]
        loc = jnp.stack([top, bottom, left, right], -1)
        if self.normalize_by_wh:
            w = bboxes[..., 2] - bboxes[..., 0]
            h = bboxes[..., 3] - bboxes[..., 1]
            loc = loc / jnp.stack([h, h, w, w], -1)
        return loc / self._norm(loc.dtype)

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        """tblr2bboxes (`tblr_bbox_coder.py:123`)."""
        loc = pred_bboxes * self._norm(pred_bboxes.dtype)
        c = (bboxes[..., 0:2] + bboxes[..., 2:4]) / 2
        if self.normalize_by_wh:
            w = bboxes[..., 2] - bboxes[..., 0]
            h = bboxes[..., 3] - bboxes[..., 1]
            loc = loc * jnp.stack([h, h, w, w], -1)
        top, bottom, left, right = (loc[..., 0], loc[..., 1],
                                    loc[..., 2], loc[..., 3])
        out = jnp.stack([c[..., 0] - left, c[..., 1] - top,
                         c[..., 0] + right, c[..., 1] + bottom], -1)
        if self.clip_border and max_shape is not None:
            out = clip_boxes(out, max_shape)
        return out


class DistancePointBBoxCoder(BaseBBoxCoder):
    """distance_point_bbox_coder: (l, t, r, b) from points (GFL/FCOS)."""

    def __init__(self, clip_border: bool = True):
        self.clip_border = clip_border

    def encode(self, points, gt_bboxes, max_dis=None, eps=0.1):
        return bbox2distance(points, gt_bboxes, max_dis, eps)

    def decode(self, points, pred_bboxes, max_shape=None):
        if not self.clip_border:
            max_shape = None
        return distance2bbox(points, pred_bboxes, max_shape)


BBOX_CODERS = {
    "DeltaXYWHBBoxCoder": DeltaXYWHBBoxCoder,
    "PseudoBBoxCoder": PseudoBBoxCoder,
    "TBLRBBoxCoder": TBLRBBoxCoder,
    "DistancePointBBoxCoder": DistancePointBBoxCoder,
    # LegacyDeltaXYWHBBoxCoder (mmdet 1.x +1 wh convention) deliberately
    # not ported: no reference config uses it.
}


def build_bbox_coder(cfg: dict):
    """`mmdet/core/bbox/builder.py build_bbox_coder`."""
    cfg = dict(cfg)
    return BBOX_CODERS[cfg.pop("type")](**cfg)
