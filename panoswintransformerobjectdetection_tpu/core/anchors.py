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
