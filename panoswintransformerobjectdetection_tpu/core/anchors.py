"""Multi-level grid anchor generation.

Matches mmdet v2.11 `AnchorGenerator` (`mmdet/core/anchor/anchor_generator.py:10`)
numerically: base size = stride, h_ratios = sqrt(ratios), w = base / sqrt(ratio)
* scale, centers at center_offset * stride (default 0), grid shifts = index *
stride, row-major (x fastest).  Anchors are host-side numpy constants — they
depend only on static feature map shapes, so they bake into the jit graph.
"""

from typing import List, Sequence, Tuple

import numpy as np


class AnchorGenerator:
    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float],
                 scales: Sequence[float] = None,
                 base_sizes: Sequence[int] = None,
                 octave_base_scale: int = None,
                 scales_per_octave: int = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else s for s in strides]
        self.base_sizes = list(base_sizes) if base_sizes is not None else \
            [min(s) for s in self.strides]
        if octave_base_scale is not None and scales_per_octave is not None:
            octave_scales = np.array(
                [2 ** (i / scales_per_octave) for i in range(scales_per_octave)])
            self.scales = octave_scales * octave_base_scale
        else:
            self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.center_offset = center_offset
        self.base_anchors = [
            self._base_anchors(bs, self.scales, self.ratios)
            for bs in self.base_sizes
        ]

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self.scales)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def _base_anchors(self, base_size, scales, ratios) -> np.ndarray:
        w = h = float(base_size)
        xc = self.center_offset * w
        yc = self.center_offset * h
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
        return np.stack([xc - 0.5 * ws, yc - 0.5 * hs,
                         xc + 0.5 * ws, yc + 0.5 * hs], axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Per level: (H*W*A, 4) anchors, ordered (y, x, anchor)."""
        assert len(featmap_sizes) == self.num_levels
        out = []
        for (fh, fw), (sw, sh), base in zip(featmap_sizes, self.strides, self.base_anchors):
            sx = np.arange(fw, dtype=np.float32) * sw
            sy = np.arange(fh, dtype=np.float32) * sh
            shift = np.stack(
                [np.tile(sx, fh), np.repeat(sy, fw)], axis=-1)
            shift = np.concatenate([shift, shift], axis=-1)   # (H*W, 4)
            anchors = base[None, :, :] + shift[:, None, :]
            out.append(anchors.reshape(-1, 4))
        return out

    def valid_flags(self, featmap_sizes, pad_shape) -> List[np.ndarray]:
        """Per level: (H*W*A,) bool — anchor center cell inside the padded image."""
        out = []
        ph, pw = pad_shape[:2]
        for (fh, fw), (sw, sh) in zip(featmap_sizes, self.strides):
            vh = min(int(np.ceil(ph / sh)), fh)
            vw = min(int(np.ceil(pw / sw)), fw)
            fy = np.zeros(fh, bool)
            fx = np.zeros(fw, bool)
            fy[:vh] = True
            fx[:vw] = True
            flag = (fy[:, None] & fx[None, :]).reshape(-1)
            out.append(np.repeat(flag, self.num_base_anchors))
        return out


class PointGenerator:
    """Per-level grid points (x, y, stride) + valid flags
    (`mmdet/core/anchor/point_generator.py:7`) — the prior for
    FCOS/RepPoints-style point heads.  Host-side numpy constants, like
    `AnchorGenerator`."""

    def grid_points(self, featmap_size, stride=16) -> np.ndarray:
        fh, fw = featmap_size
        sx = np.arange(fw, dtype=np.float32) * stride
        sy = np.arange(fh, dtype=np.float32) * stride
        xx = np.tile(sx, fh)
        yy = np.repeat(sy, fw)
        return np.stack([xx, yy, np.full_like(xx, stride)], axis=-1)

    def valid_flags(self, featmap_size, valid_size) -> np.ndarray:
        fh, fw = featmap_size
        vh, vw = valid_size
        assert vh <= fh and vw <= fw
        fy = np.zeros(fh, bool)
        fx = np.zeros(fw, bool)
        fy[:vh] = True
        fx[:vw] = True
        return (fy[:, None] & fx[None, :]).reshape(-1)


class YOLOAnchorGenerator:
    """Clustered (w, h) anchors with grid-cell centers
    (`anchor_generator.py:595 YOLOAnchorGenerator`): base_sizes is a
    per-level list of (w, h) pairs; anchors center on (stride/2, stride/2).
    `responsible_flags` marks the single grid cell containing each gt
    center (the YOLO assignment rule, `models/yolo.py` training path)."""

    def __init__(self, strides: Sequence[int],
                 base_sizes: Sequence[Sequence[Tuple[int, int]]]):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s)
                        for s in strides]
        self.centers = [(s[0] / 2.0, s[1] / 2.0) for s in self.strides]
        n0 = len(base_sizes[0])
        assert all(len(b) == n0 for b in base_sizes)
        self.base_sizes = [[tuple(b) for b in lvl] for lvl in base_sizes]
        self.base_anchors = [
            self._level_base_anchors(lvl, c)
            for lvl, c in zip(self.base_sizes, self.centers)]

    @property
    def num_levels(self) -> int:
        return len(self.base_sizes)

    @property
    def num_base_anchors(self) -> List[int]:
        return [len(b) for b in self.base_anchors]

    def _level_base_anchors(self, sizes, center) -> np.ndarray:
        xc, yc = center
        out = [[xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h]
               for (w, h) in sizes]
        return np.asarray(out, np.float32)

    def grid_anchors(self, featmap_sizes) -> List[np.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        out = []
        for (fh, fw), (sw, sh), base in zip(featmap_sizes, self.strides,
                                            self.base_anchors):
            sx = np.arange(fw, dtype=np.float32) * sw
            sy = np.arange(fh, dtype=np.float32) * sh
            shift = np.stack([np.tile(sx, fh), np.repeat(sy, fw)], axis=-1)
            shift = np.concatenate([shift, shift], axis=-1)
            out.append((base[None] + shift[:, None]).reshape(-1, 4))
        return out

    def responsible_flags(self, featmap_sizes, gt_bboxes) -> List[np.ndarray]:
        """Per level: (H*W*A,) bool — grid cell contains a gt center."""
        gt = np.asarray(gt_bboxes, np.float32).reshape(-1, 4)
        cx = (gt[:, 0] + gt[:, 2]) * 0.5
        cy = (gt[:, 1] + gt[:, 3]) * 0.5
        out = []
        for (fh, fw), (sw, sh), base in zip(featmap_sizes, self.strides,
                                            self.base_anchors):
            gx = np.floor(cx / sw).astype(np.int64)
            gy = np.floor(cy / sh).astype(np.int64)
            idx = gy * fw + gx
            flag = np.zeros(fh * fw, bool)
            inb = (gx >= 0) & (gx < fw) & (gy >= 0) & (gy < fh)
            flag[idx[inb]] = True
            out.append(np.repeat(flag, len(base)))
        return out


def images_to_levels(target, num_levels):
    """`mmdet/core/anchor/utils.py:4`: list of per-image flat targets ->
    list of per-level (B, n_level, ...) arrays."""
    import jax.numpy as jnp
    target = jnp.stack([jnp.asarray(t) for t in target], 0)
    out, start = [], 0
    for n in num_levels:
        out.append(target[:, start:start + n])
        start += n
    return out


def anchor_inside_flags(flat_anchors, valid_flags, img_shape,
                        allowed_border: int = 0):
    """`mmdet/core/anchor/utils.py:20`: anchors fully inside the image
    border (expanded by allowed_border); negative border disables."""
    import jax.numpy as jnp
    if allowed_border < 0:
        return valid_flags
    h, w = img_shape[:2]
    a = jnp.asarray(flat_anchors)
    return (jnp.asarray(valid_flags)
            & (a[:, 0] >= -allowed_border) & (a[:, 1] >= -allowed_border)
            & (a[:, 2] < w + allowed_border) & (a[:, 3] < h + allowed_border))


def calc_region(bbox, ratio, featmap_size=None):
    """`mmdet/core/anchor/utils.py:49`: center-anchored sub-region of a
    single (4,) box at `ratio`, rounded to ints (guided-anchor loc
    targets).  Returns (x1, y1, x2, y2)."""
    import jax.numpy as jnp
    b = jnp.asarray(bbox)
    x1 = jnp.round((1 - ratio) * b[0] + ratio * b[2]).astype(jnp.int32)
    y1 = jnp.round((1 - ratio) * b[1] + ratio * b[3]).astype(jnp.int32)
    x2 = jnp.round(ratio * b[0] + (1 - ratio) * b[2]).astype(jnp.int32)
    y2 = jnp.round(ratio * b[1] + (1 - ratio) * b[3]).astype(jnp.int32)
    if featmap_size is not None:
        x1 = jnp.clip(x1, 0, featmap_size[1])
        y1 = jnp.clip(y1, 0, featmap_size[0])
        x2 = jnp.clip(x2, 0, featmap_size[1])
        y2 = jnp.clip(y2, 0, featmap_size[0])
    return x1, y1, x2, y2


# `anchor/builder.py` registry role
ANCHOR_GENERATORS = {
    "AnchorGenerator": AnchorGenerator,
    "PointGenerator": PointGenerator,
    "YOLOAnchorGenerator": YOLOAnchorGenerator,
    # LegacyAnchorGenerator (mmdet 1.x center offsets) deliberately not
    # ported: nothing in the reference's configs instantiates it.
}


def build_anchor_generator(cfg: dict):
    """`mmdet/core/anchor/builder.py build_anchor_generator`."""
    cfg = dict(cfg)
    return ANCHOR_GENERATORS[cfg.pop("type")](**cfg)
