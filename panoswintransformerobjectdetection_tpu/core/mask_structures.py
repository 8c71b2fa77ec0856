"""Instance-mask containers (`mmdet/core/mask/structures.py`).

Host-side numpy/cv2 structures used by the data pipeline and custom
transforms — deliberately NOT jax: geometry edits on ragged per-instance
masks belong on the host; devices only ever see the fixed-shape padded
bitmaps the loader emits.  `BitmapMasks` stores dense (N, H, W) uint8;
`PolygonMasks` stores per-instance lists of flat [x0, y0, x1, y1, ...]
polygons and rasterizes on demand via `core.rle`.
"""

from typing import List, Sequence

import numpy as np


class BaseInstanceMasks:
    """Interface marker (`structures.py BaseInstanceMasks`)."""


class BitmapMasks(BaseInstanceMasks):
    """Dense (N, H, W) uint8 masks (`structures.py:217`)."""

    def __init__(self, masks, height: int, width: int):
        self.height = int(height)
        self.width = int(width)
        if len(masks) == 0:
            self.masks = np.empty((0, self.height, self.width), np.uint8)
        else:
            self.masks = np.stack([np.asarray(m, np.uint8) for m in masks])
            assert self.masks.shape[1:] == (self.height, self.width)

    def __getitem__(self, index):
        m = self.masks[index].reshape(-1, self.height, self.width)
        return BitmapMasks(m, self.height, self.width)

    def __iter__(self):
        return iter(self.masks)

    def __len__(self):
        return len(self.masks)

    def __repr__(self):
        return (f"BitmapMasks(num_masks={len(self)}, "
                f"height={self.height}, width={self.width})")

    def rescale(self, scale, interpolation="nearest"):
        """Scale-factor resize keeping aspect (`structures.py:260`):
        scale is a float or a (long, short) cap pair."""
        new_w, new_h = _rescale_size(self.width, self.height, scale)
        return self.resize((new_h, new_w), interpolation)

    def resize(self, out_shape, interpolation="nearest"):
        import cv2
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        interp = (cv2.INTER_NEAREST if interpolation == "nearest"
                  else cv2.INTER_LINEAR)
        out = np.stack([cv2.resize(m, (w, h), interpolation=interp)
                        for m in self.masks])
        return BitmapMasks(out, h, w)

    def flip(self, flip_direction: str = "horizontal"):
        assert flip_direction in ("horizontal", "vertical", "diagonal")
        if flip_direction == "horizontal":
            out = self.masks[:, :, ::-1]
        elif flip_direction == "vertical":
            out = self.masks[:, ::-1, :]
        else:
            out = self.masks[:, ::-1, ::-1]
        return BitmapMasks(out.copy(), self.height, self.width)

    def pad(self, out_shape, pad_val: int = 0):
        h, w = out_shape
        out = np.full((len(self), h, w), pad_val, np.uint8)
        out[:, :self.height, :self.width] = self.masks
        return BitmapMasks(out, h, w)

    def crop(self, bbox):
        """Crop every mask by one (4,) xyxy box (`structures.py:309`)."""
        bbox = np.asarray(bbox).copy()
        bbox[0::2] = np.clip(bbox[0::2], 0, self.width)
        bbox[1::2] = np.clip(bbox[1::2], 0, self.height)
        x1, y1, x2, y2 = bbox.astype(np.int64)
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)
        if len(self) == 0:
            return BitmapMasks([], h, w)
        return BitmapMasks(self.masks[:, y1:y1 + h, x1:x1 + w], h, w)

    def crop_and_resize(self, bboxes, out_shape, inds, interpolation="bilinear"):
        """RoIAlign-style per-box crops (`structures.py:328`): bboxes
        (K, 4), inds (K,) selecting the source mask for each box; returns
        BitmapMasks of shape (K, *out_shape) — mask-target assembly."""
        import cv2
        if len(bboxes) == 0:
            return BitmapMasks([], *out_shape)
        oh, ow = out_shape
        interp = (cv2.INTER_NEAREST if interpolation == "nearest"
                  else cv2.INTER_LINEAR)
        out = []
        for box, ind in zip(np.asarray(bboxes), np.asarray(inds)):
            x1, y1, x2, y2 = box
            x1i = int(np.clip(np.floor(x1), 0, self.width))
            y1i = int(np.clip(np.floor(y1), 0, self.height))
            x2i = int(np.clip(np.ceil(x2), 0, self.width))
            y2i = int(np.clip(np.ceil(y2), 0, self.height))
            patch = self.masks[int(ind), y1i:max(y2i, y1i + 1),
                               x1i:max(x2i, x1i + 1)]
            r = cv2.resize(patch.astype(np.float32), (ow, oh),
                           interpolation=interp)
            out.append((r > 0.5).astype(np.uint8))
        return BitmapMasks(out, oh, ow)

    def expand(self, expanded_h, expanded_w, top, left):
        """Paste into a larger canvas (`structures.py:360`, Expand aug)."""
        out = np.zeros((len(self), expanded_h, expanded_w), np.uint8)
        out[:, top:top + self.height, left:left + self.width] = self.masks
        return BitmapMasks(out, expanded_h, expanded_w)

    def translate(self, out_shape, offset, direction="horizontal",
                  fill_val=0, interpolation=None):
        """AutoAugment translate (`structures.py:372`)."""
        out = np.full((len(self), *out_shape), fill_val, np.uint8)
        off = int(round(offset))
        h, w = self.height, self.width
        if direction == "horizontal":
            src = self.masks[:, :, max(0, -off):w - max(0, off)]
            out[:, :h, max(0, off):max(0, off) + src.shape[2]] = src
        else:
            src = self.masks[:, max(0, -off):h - max(0, off), :]
            out[:, max(0, off):max(0, off) + src.shape[1], :w] = src
        return BitmapMasks(out, *out_shape)

    def shear(self, out_shape, magnitude, direction="horizontal",
              border_value=0, interpolation="bilinear"):
        """AutoAugment shear (`structures.py:422`)."""
        import cv2
        if direction == "horizontal":
            mat = np.array([[1, magnitude, 0], [0, 1, 0]], np.float32)
        else:
            mat = np.array([[1, 0, 0], [magnitude, 1, 0]], np.float32)
        return self._affine(mat, out_shape, border_value, interpolation)

    def rotate(self, out_shape, angle, center=None, scale=1.0, fill_val=0):
        """AutoAugment rotate (`structures.py:457`)."""
        import cv2
        if center is None:
            center = ((self.width - 1) * 0.5, (self.height - 1) * 0.5)
        mat = cv2.getRotationMatrix2D(center, -angle, scale)
        return self._affine(mat, out_shape, fill_val, "bilinear")

    def _affine(self, mat, out_shape, border_value, interpolation):
        import cv2
        h, w = out_shape
        if len(self) == 0:
            return BitmapMasks([], h, w)
        interp = (cv2.INTER_NEAREST if interpolation == "nearest"
                  else cv2.INTER_LINEAR)
        out = [cv2.warpAffine(m, mat, (w, h), flags=interp,
                              borderValue=border_value) for m in self.masks]
        return BitmapMasks([(o > 0.5).astype(np.uint8) for o in out], h, w)

    @property
    def areas(self):
        return self.masks.sum((1, 2)).astype(np.float32)

    def to_ndarray(self):
        return self.masks

    def to_tensor(self, dtype=None, device=None):
        """Device array (`to_tensor` role — jnp, not torch)."""
        import jax.numpy as jnp
        return jnp.asarray(self.masks, dtype or jnp.uint8)

    @classmethod
    def random(cls, num_masks=3, height=32, width=32, dtype=np.uint8,
               rng=None):
        rng = rng or np.random.default_rng(0)
        masks = (rng.random((num_masks, height, width)) > 0.7).astype(dtype)
        return cls(masks, height, width)


class PolygonMasks(BaseInstanceMasks):
    """Per-instance polygon lists (`structures.py:564`): masks is
    list[list[ndarray (2k,)]] — multiple polygons per instance."""

    def __init__(self, masks: Sequence[Sequence], height: int, width: int):
        self.height = int(height)
        self.width = int(width)
        self.masks = [[np.asarray(p, np.float32).reshape(-1) for p in obj]
                      for obj in masks]

    def __getitem__(self, index):
        if isinstance(index, (int, np.integer)):
            sel = [self.masks[int(index)]]
        else:
            idx = np.arange(len(self.masks))[index]
            sel = [self.masks[int(i)] for i in np.atleast_1d(idx)]
        return PolygonMasks(sel, self.height, self.width)

    def __iter__(self):
        return iter(self.masks)

    def __len__(self):
        return len(self.masks)

    def __repr__(self):
        return (f"PolygonMasks(num_masks={len(self)}, "
                f"height={self.height}, width={self.width})")

    def _map(self, fn, height=None, width=None):
        out = [[fn(p.copy()) for p in obj] for obj in self.masks]
        return PolygonMasks(out, height or self.height, width or self.width)

    def rescale(self, scale, interpolation=None):
        new_w, new_h = _rescale_size(self.width, self.height, scale)
        return self.resize((new_h, new_w))

    def resize(self, out_shape, interpolation=None):
        h, w = out_shape
        hs, ws = h / self.height, w / self.width

        def fn(p):
            p[0::2] *= ws
            p[1::2] *= hs
            return p
        return self._map(fn, h, w)

    def flip(self, flip_direction: str = "horizontal"):
        assert flip_direction in ("horizontal", "vertical", "diagonal")

        def fn(p):
            if flip_direction in ("horizontal", "diagonal"):
                p[0::2] = self.width - p[0::2]
            if flip_direction in ("vertical", "diagonal"):
                p[1::2] = self.height - p[1::2]
            return p
        return self._map(fn)

    def pad(self, out_shape, pad_val=0):
        return PolygonMasks(self.masks, *out_shape)   # no-op on polygons

    def crop(self, bbox):
        bbox = np.asarray(bbox).copy()
        bbox[0::2] = np.clip(bbox[0::2], 0, self.width)
        bbox[1::2] = np.clip(bbox[1::2], 0, self.height)
        x1, y1, x2, y2 = bbox
        w = max(x2 - x1, 1)
        h = max(y2 - y1, 1)

        def fn(p):
            p[0::2] -= x1
            p[1::2] -= y1
            return p
        return self._map(fn, int(h), int(w))

    def crop_and_resize(self, bboxes, out_shape, inds,
                        interpolation="bilinear"):
        return self.to_bitmap().crop_and_resize(bboxes, out_shape, inds,
                                                interpolation)

    @property
    def areas(self):
        """Shoelace polygon area (`structures.py:490` _polygon_area)."""
        out = []
        for obj in self.masks:
            a = 0.0
            for p in obj:
                x, y = p[0::2], p[1::2]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1))
                               - np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out, np.float32)

    def to_bitmap(self) -> BitmapMasks:
        """Rasterize (`structures.py to_bitmap`) via `core.rle` (same
        integer-grid protocol as pycocotools)."""
        from . import rle as rle_utils
        bitmaps = [rle_utils.polygons_to_mask(obj, self.height, self.width)
                   for obj in self.masks]
        return BitmapMasks(bitmaps, self.height, self.width)

    def to_ndarray(self):
        return self.to_bitmap().masks

    def to_tensor(self, dtype=None, device=None):
        import jax.numpy as jnp
        return jnp.asarray(self.to_ndarray(), dtype or jnp.uint8)


def _rescale_size(w, h, scale):
    """mmcv.rescale_size: float factor, or (long, short) cap pair."""
    if isinstance(scale, (float, int)):
        f = float(scale)
    else:
        long_side, short_side = max(scale), min(scale)
        f = min(long_side / max(h, w), short_side / min(h, w))
    return int(w * f + 0.5), int(h * f + 0.5)


def encode_mask_results(mask_results):
    """`mmdet/core/mask/utils.py encode_mask_results`: per-class lists of
    (H, W) binary masks -> compressed RLE dicts for json/eval."""
    from . import rle as rle_utils
    return [[rle_utils.encode(np.asarray(m, np.uint8)) for m in cls_masks]
            for cls_masks in mask_results]


def split_combined_polys(polys, poly_lens, polys_per_mask):
    """`mmdet/core/mask/utils.py split_combined_polys`: undo the collated
    flat polygon buffer back into per-instance polygon lists."""
    mask_polys_list = []
    for img_polys, img_lens, img_ppm in zip(polys, poly_lens, polys_per_mask):
        split = np.split(np.asarray(img_polys), np.cumsum(img_lens)[:-1])
        mask_polys = []
        start = 0
        for n in img_ppm:
            mask_polys.append([split[start + i] for i in range(n)])
            start += n
        mask_polys_list.append(mask_polys)
    return mask_polys_list
