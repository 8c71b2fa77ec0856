"""Pipeline transforms (host-side numpy/cv2).

Covers the reference pipeline ops (`mmdet/datasets/pipelines/transforms.py`
+ the pano additions `PanoResize:347`, `PanoStretch:992`, `RollAug:1025`,
`PanoCheck:1120`, and the `lzx` augs they delegate to: `xzaug.py:142`,
`rollaug.py:11`).  Each transform mutates a `results` dict:

  img (H, W, 3 float32), gt_bboxes (N, 4 xyxy px), gt_labels (N,),
  img_shape, ori_shape, pad_shape, scale_factor (4,), pano_ratio_v (2,)
"""

import math
import os.path as osp
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, results):
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results


class LoadImageFromFile:
    def __init__(self, to_float32: bool = True):
        self.to_float32 = to_float32

    def __call__(self, results):
        path = results["img_path"]
        img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR
        if img is None:
            raise FileNotFoundError(path)
        if self.to_float32:
            img = img.astype(np.float32)
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results.setdefault("scale_factor", np.ones(4, np.float32))
        return results


class LoadAnnotations:
    """Copies pre-parsed ann arrays into working keys; `with_mask`
    rasterizes COCO polygons to per-instance bitmaps
    (`pipelines/loading.py LoadAnnotations` + BitmapMasks role).  The pano
    subclass hook (`LoadPanoAnnotations:392`, BFoV -> sphere) runs at
    dataset parse time (see `datasets.Indoor360Dataset`)."""
    def __init__(self, with_bbox: bool = True, with_mask: bool = False, **_):
        self.with_bbox = with_bbox
        self.with_mask = with_mask

    def __call__(self, results):
        ann = results["ann_info"]
        results["gt_bboxes"] = ann["bboxes"].astype(np.float32).copy()
        results["gt_labels"] = ann["labels"].astype(np.int64).copy()
        if self.with_mask:
            h, w = results["img"].shape[:2]
            polys = ann.get("polys") or [None] * len(results["gt_bboxes"])
            masks = np.zeros((len(polys), h, w), np.uint8)
            for i, pl in enumerate(polys):
                if pl:
                    pts = [np.asarray(pp, np.float64).reshape(-1, 2).astype(np.int32)
                           for pp in pl if len(pp) >= 6]
                    if pts:
                        cv2.fillPoly(masks[i], pts, 1)
                        continue
                # fallback: box-filled mask
                x1, y1, x2, y2 = results["gt_bboxes"][i].astype(int)
                masks[i, max(y1, 0):y2, max(x1, 0):x2] = 1
            results["gt_masks"] = masks
        return results


def _resize_img(img, new_w, new_h):
    return cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)


class Resize:
    """Keep-ratio multi-scale resize (mmdet Resize semantics):
    scale = min(long_max / long, short_max / short)."""
    def __init__(self, img_scale, keep_ratio: bool = True,
                 multiscale_mode: str = "value"):
        if isinstance(img_scale[0], (int, float)):
            img_scale = [tuple(img_scale)]
        self.img_scale = [tuple(s) for s in img_scale]
        self.keep_ratio = keep_ratio
        self.multiscale_mode = multiscale_mode

    def _pick_scale(self):
        if len(self.img_scale) == 1:
            return self.img_scale[0]
        if self.multiscale_mode == "value":
            return random.choice(self.img_scale)
        # 'range': sample the short edge uniformly between the two extremes
        shorts = [min(s) for s in self.img_scale]
        longs = [max(s) for s in self.img_scale]
        short = random.randint(min(shorts), max(shorts))
        return (short, max(longs))

    def __call__(self, results):
        h, w = results["img"].shape[:2]
        scale = self._pick_scale()
        short, long_ = min(scale), max(scale)
        if self.keep_ratio:
            f = min(long_ / max(h, w), short / min(h, w))
            new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
        else:
            new_h, new_w = scale
        img = _resize_img(results["img"], new_w, new_h)
        w_f = new_w / w
        h_f = new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["scale_factor"] = np.array([w_f, h_f, w_f, h_f], np.float32)
        if "gt_bboxes" in results:
            b = results["gt_bboxes"] * results["scale_factor"]
            b[:, 0::2] = b[:, 0::2].clip(0, new_w)
            b[:, 1::2] = b[:, 1::2].clip(0, new_h)
            results["gt_bboxes"] = b
        if "gt_masks" in results and len(results["gt_masks"]):
            results["gt_masks"] = np.stack([
                cv2.resize(m, (new_w, new_h), interpolation=cv2.INTER_NEAREST)
                for m in results["gt_masks"]])
        return results


class PanoResize(Resize):
    """Aspect-preserving resize that keeps panoramas full-width
    (`transforms.py:347 PanoResize`): the scale factor applies to the full
    equirect width so no horizontal crop is introduced."""
    def __call__(self, results):
        h, w = results["img"].shape[:2]
        scale = self._pick_scale()
        short = min(scale)
        f = short / h   # panorama: height is the short side, width = 2h
        new_w, new_h = int(w * f + 0.5), int(h * f + 0.5)
        img = _resize_img(results["img"], new_w, new_h)
        w_f, h_f = new_w / w, new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["scale_factor"] = np.array([w_f, h_f, w_f, h_f], np.float32)
        if "gt_bboxes" in results:
            results["gt_bboxes"] = results["gt_bboxes"] * results["scale_factor"]
        return results


class RandomFlip:
    def __init__(self, flip_ratio: float = 0.5):
        self.flip_ratio = flip_ratio

    def __call__(self, results):
        if random.random() < self.flip_ratio:
            img = results["img"][:, ::-1]
            results["img"] = np.ascontiguousarray(img)
            w = img.shape[1]
            if "gt_bboxes" in results:
                b = results["gt_bboxes"].copy()
                b[:, 0], b[:, 2] = w - results["gt_bboxes"][:, 2], \
                    w - results["gt_bboxes"][:, 0]
                results["gt_bboxes"] = b
            if "gt_masks" in results and len(results["gt_masks"]):
                results["gt_masks"] = np.ascontiguousarray(
                    results["gt_masks"][:, :, ::-1])
            results["flip"] = True
        else:
            results["flip"] = False
        return results


class Normalize:
    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        img = results["img"].astype(np.float32)
        if self.to_rgb:
            img = img[..., ::-1]
        results["img"] = (img - self.mean) / self.std
        return results


class Pad:
    def __init__(self, size_divisor: int = 32):
        self.size_divisor = size_divisor

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        ph = -h % self.size_divisor
        pw = -w % self.size_divisor
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            if "gt_masks" in results and len(results["gt_masks"]):
                results["gt_masks"] = np.pad(
                    results["gt_masks"], ((0, 0), (0, ph), (0, pw)))
        results["img"] = img
        results["pad_shape"] = img.shape
        return results


def _uv_tri(w, h):
    u = (((np.arange(w) + 0.5) / w) - 0.5) * 2 * np.pi
    v = (((np.arange(h) + 0.5) / h) - 0.5) * np.pi
    uu, vv = np.meshgrid(u, v)
    return np.sin(uu), np.cos(uu), np.tan(vv)


def pano_stretch(img, boxes, kx, ky):
    """Pano-stretch (`xzaug.py:98 getAug`): stretch the scene along the
    tangent axes by (kx, ky) and resample the equirect image; boxes map
    through the closed-form uv warp of their corner points."""
    from scipy.ndimage import map_coordinates
    h, w = img.shape[:2]
    sin_u, cos_u, tan_v = _uv_tri(w, h)
    u0 = np.arctan2(sin_u * kx / ky, cos_u)
    v0 = np.arctan(tan_v * np.sin(u0) / sin_u * ky)
    refx = (u0 / (2 * np.pi) + 0.5) * w - 0.5
    refy = (v0 / np.pi + 0.5) * h - 0.5
    out = np.stack([
        map_coordinates(img[..., i], [refy, refx], order=1, mode="wrap")
        for i in range(img.shape[-1])
    ], axis=-1)

    if boxes is not None and len(boxes):
        pts = boxes.reshape(-1, 2)
        cu0 = ((pts[:, 0] + 0.5) / w - 0.5) * 2 * np.pi
        cv0 = ((pts[:, 1] + 0.5) / h - 0.5) * np.pi
        with np.errstate(divide="ignore", invalid="ignore"):
            cu = np.arctan2(np.sin(cu0) * ky / kx, np.cos(cu0))
            cv = np.arctan(np.tan(cv0) * np.sin(cu) / np.sin(cu0) / ky)
        cv = np.where(np.abs(np.sin(cu0)) < 1e-9, np.arctan(np.tan(cv0) / ky), cv)
        px = (cu / (2 * np.pi) + 0.5) * w - 0.5
        py = (cv / np.pi + 0.5) * h - 0.5
        boxes = np.stack([px, py], -1).reshape(-1, 4).astype(np.float32)
        boxes = np.stack([np.minimum(boxes[:, 0], boxes[:, 2]),
                          np.minimum(boxes[:, 1], boxes[:, 3]),
                          np.maximum(boxes[:, 0], boxes[:, 2]),
                          np.maximum(boxes[:, 1], boxes[:, 3])], -1)
    return out, boxes


class PanoStretch:
    """`transforms.py:992`: random kx, ky in [1, k] (inverted half the time)."""
    def __init__(self, chance: float = 1.0, kxy=(2.0, 2.0)):
        self.chance = chance
        self.kxy = kxy

    def __call__(self, results):
        if random.random() >= self.chance:
            return results
        kx = random.uniform(1.0, self.kxy[0])
        ky = random.uniform(1.0, self.kxy[1])
        if random.random() < 0.5:
            kx = 1.0 / kx
        if random.random() < 0.5:
            ky = 1.0 / ky
        img, boxes = pano_stretch(results["img"], results.get("gt_bboxes"), kx, ky)
        results["img"] = img.astype(np.float32)
        if boxes is not None:
            h, w = img.shape[:2]
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
            results["gt_bboxes"] = boxes
        return results


class RollAug:
    """Horizontal wrap-around roll (`rollaug.py:11`): shift the pano by a
    random fraction of its width; boxes crossing the seam keep the larger
    fragment (clip01 semantics)."""
    def __init__(self, chance: float = 1.0, clip01: bool = True):
        self.chance = chance
        self.clip01 = clip01

    def __call__(self, results):
        if random.random() >= self.chance:
            return results
        img = results["img"]
        h, w = img.shape[:2]
        dist = random.random()
        shift = int(dist * w)
        results["img"] = np.ascontiguousarray(np.roll(img, shift, axis=1))
        if "gt_bboxes" in results and len(results["gt_bboxes"]):
            b = results["gt_bboxes"].copy()
            b[:, 0] += shift
            b[:, 2] += shift
            over = b[:, 2] > w
            center_over = (b[:, 0] + b[:, 2]) * 0.5 > w
            # box mostly past the seam: move it to the left edge
            b[:, 0] = np.where(over & center_over, np.maximum(b[:, 0] - w, 0), b[:, 0])
            b[:, 2] = np.where(over & center_over, b[:, 2] - w, b[:, 2])
            # box mostly before the seam: clip the protruding part
            b[:, 2] = np.where(over & ~center_over, w, b[:, 2])
            results["gt_bboxes"] = b
        return results


class BasketBallExpand:
    """Test-time latitude-corrected channel concat (`transforms.py:661`).

    The reference implementation references an undefined `transd`
    (`transforms.py:701` — broken as-is, SURVEY.md §7); the intended
    behavior is implemented: the basketball-corrected image is appended as
    extra channels so the backbone sees both representations.
    """
    def __init__(self, patch_size: int = 20):
        self.patch_size = patch_size

    def __call__(self, results):
        import jax.numpy as jnp
        from ..geometry.basketball import correct_center
        img = results["img"]
        ratio = tuple(results.get("pano_ratio_v", (0.0, 1.0))[:2])
        corrected = np.asarray(correct_center(
            jnp.asarray(img), self.patch_size, ratio_v=ratio))
        results["img"] = np.concatenate([img, corrected], axis=-1)
        return results


class PanoCheck:
    """Inject the default full-pano `pano_ratio_v` (`transforms.py:1120`)."""
    def __call__(self, results):
        results.setdefault("pano_ratio_v", np.array([0.0, 1.0], np.float32))
        return results


class RandomCrop:
    """Random crop (mmdet `RandomCrop`, crop_type='absolute_range'):
    sample a crop size in [crop_size, (h, w)], shift boxes, drop boxes whose
    center leaves the crop (allow_negative_crop keeps empty results)."""
    def __init__(self, crop_size, crop_type: str = "absolute_range",
                 allow_negative_crop: bool = True):
        self.crop_size = tuple(crop_size)
        self.crop_type = crop_type
        self.allow_negative_crop = allow_negative_crop

    def __call__(self, results):
        img = results["img"]
        h, w = img.shape[:2]
        if self.crop_type == "absolute_range":
            ch = min(h, random.randint(min(self.crop_size[0], h), max(self.crop_size[0], min(self.crop_size[1], h))))
            cw = min(w, random.randint(min(self.crop_size[0], w), max(self.crop_size[0], min(self.crop_size[1], w))))
        else:  # 'absolute'
            ch, cw = min(self.crop_size[0], h), min(self.crop_size[1], w)
        y0 = random.randint(0, h - ch)
        x0 = random.randint(0, w - cw)
        crop = img[y0:y0 + ch, x0:x0 + cw]
        boxes = results.get("gt_bboxes")
        if boxes is not None and len(boxes):
            b = boxes.copy()
            b[:, 0::2] -= x0
            b[:, 1::2] -= y0
            b[:, 0::2] = b[:, 0::2].clip(0, cw)
            b[:, 1::2] = b[:, 1::2].clip(0, ch)
            keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            if not keep.any() and not self.allow_negative_crop:
                return results  # skip the crop entirely
            results["gt_bboxes"] = b[keep]
            results["gt_labels"] = results["gt_labels"][keep]
        results["img"] = np.ascontiguousarray(crop)
        results["img_shape"] = crop.shape
        return results


class AutoAugment:
    """mmdet `AutoAugment`: pick one policy (a list of transforms, built via
    `data.builder.build_pipeline`) uniformly per sample."""
    def __init__(self, policies):
        from .builder import build_pipeline
        self.policies = [Compose(build_pipeline(p)) for p in policies]

    def __call__(self, results):
        return random.choice(self.policies)(results)


class PhotoMetricDistortion:
    """Photometric jitter (`mmdet/datasets/pipelines/transforms.py`
    PhotoMetricDistortion): random brightness / contrast / saturation /
    hue, with the reference's random contrast-ordering.  Host-side numpy
    on uint8-range float images (applied before Normalize)."""

    def __init__(self, brightness_delta=32, contrast_range=(0.5, 1.5),
                 saturation_range=(0.5, 1.5), hue_delta=18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results):
        import cv2
        img = results["img"].astype(np.float32)
        if random.random() < 0.5:
            img = img + random.uniform(-self.brightness_delta,
                                       self.brightness_delta)
        contrast_first = random.random() < 0.5
        if contrast_first and random.random() < 0.5:
            img = img * random.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if random.random() < 0.5:
            hsv[..., 1] = hsv[..., 1] * random.uniform(*self.saturation_range)
        if random.random() < 0.5:
            hsv[..., 0] = (hsv[..., 0] +
                           random.uniform(-self.hue_delta, self.hue_delta)) % 180
        img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                           cv2.COLOR_HSV2BGR).astype(np.float32)
        if not contrast_first and random.random() < 0.5:
            img = img * random.uniform(*self.contrast_range)
        results["img"] = np.clip(img, 0, 255)
        return results


class InstaBoost:
    """In-tree InstaBoost (reference `configs/instaboost/` pipelines call
    the external `instaboostfast` package, `mmdet/datasets/pipelines/
    instaboost.py`): per-instance crop-jitter-paste augmentation.

    Implements the geometric core of the method — with probability
    `aug_ratio`, each masked instance is cut out, the hole inpainted from
    its surroundings, and the instance re-pasted under a random affine
    (translation bounded by bbox_size/dx,dy; scale; rotation theta in
    degrees); boxes/masks are updated from the transformed mask.  The
    appearance-consistency heatmap (matting) refinement of the original
    package is intentionally omitted — placement is locally jittered, so
    background statistics stay valid.  'horizontal' restricts motion to x.
    """

    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        self.action_candidate = tuple(action_candidate)
        self.action_prob = tuple(action_prob)
        self.scale = tuple(scale)
        self.dx, self.dy = dx, dy
        self.theta = tuple(theta)
        self.color_prob = color_prob
        self.aug_ratio = aug_ratio

    def _jitter_one(self, img, mask, box, action):
        import cv2
        h, w = img.shape[:2]
        x1, y1, x2, y2 = box
        bw, bh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        tx = random.uniform(-bw / self.dx, bw / self.dx)
        ty = 0.0 if action == "horizontal" else random.uniform(
            -bh / self.dy, bh / self.dy)
        s = random.uniform(*self.scale)
        ang = random.uniform(*self.theta)
        cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
        M = cv2.getRotationMatrix2D((cx, cy), ang, s)
        M[0, 2] += tx
        M[1, 2] += ty

        m8 = (mask > 0).astype(np.uint8)
        inst = img * m8[..., None]
        # fill the source hole from its neighborhood
        bg = cv2.inpaint(img.astype(np.uint8), m8 * 255, 3,
                         cv2.INPAINT_TELEA).astype(img.dtype)
        if random.random() < self.color_prob:
            # mild photometric jitter of the pasted instance
            warp_gain = random.uniform(0.9, 1.1)
            warp_bias = random.uniform(-10.0, 10.0)
            inst = np.clip(inst * warp_gain + warp_bias * (m8[..., None] > 0),
                           0, 255).astype(inst.dtype)
        warped = cv2.warpAffine(inst, M, (w, h))
        wm = cv2.warpAffine(m8, M, (w, h), flags=cv2.INTER_NEAREST)
        if wm.sum() < 4:          # jittered off-image: keep the original
            return img, mask, box
        out = np.where(wm[..., None] > 0, warped, bg)
        ys, xs = np.nonzero(wm)
        nbox = np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        np.float32)
        return out, wm.astype(mask.dtype), nbox

    def __call__(self, results):
        if "gt_masks" not in results or not len(results["gt_masks"]):
            return results
        if random.random() >= self.aug_ratio:
            return results
        img = results["img"]
        boxes = results["gt_bboxes"].copy()
        masks = list(results["gt_masks"])
        for i in range(len(masks)):
            action = random.choices(self.action_candidate,
                                    weights=self.action_prob)[0]
            if action == "skip":
                continue
            img, masks[i], boxes[i] = self._jitter_one(
                img, masks[i], boxes[i], action)
        results["img"] = img
        results["gt_bboxes"] = boxes
        results["gt_masks"] = np.stack(masks)
        return results
