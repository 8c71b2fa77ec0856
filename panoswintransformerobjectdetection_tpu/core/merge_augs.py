"""TTA merge functions (`mmdet/core/post_processing/merge_augs.py`).

Named API for custom aug_test implementations; `apis/tta.py` is the
orchestrated path used by `tools/test.py --tta`.  Each function maps
per-aug outputs back to original-image coordinates with
`bbox_mapping_back` and reduces (mean for boxes/scores/masks, NMS for
proposals) — same protocol as the reference.
"""

from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .bbox import bbox_mapping_back


def _meta(img_info):
    """img_metas entries arrive as dict or [dict] (the reference indexes
    [0] for bboxes/masks but not proposals; accept both everywhere)."""
    return img_info[0] if isinstance(img_info, (list, tuple)) else img_info


def merge_aug_proposals(aug_proposals, img_metas, cfg: dict):
    """`merge_augs.py:12`: per-aug (n, 5) score-carrying proposals ->
    original coords -> joint NMS -> top max_per_img (k, 5)."""
    from ..ops.nms import nms

    iou_thr = cfg.get("nms", {}).get("iou_threshold",
                                     cfg.get("nms_thr", 0.7))
    max_per_img = cfg.get("max_per_img", cfg.get("max_num", 1000))
    recovered = []
    for proposals, img_info in zip(aug_proposals, img_metas):
        m = _meta(img_info)
        boxes = bbox_mapping_back(
            jnp.asarray(proposals)[:, :4], m["img_shape"],
            m["scale_factor"], m.get("flip", False),
            m.get("flip_direction", "horizontal"))
        recovered.append(jnp.concatenate(
            [boxes, jnp.asarray(proposals)[:, 4:5]], axis=1))
    merged = jnp.concatenate(recovered, axis=0)
    k = min(max_per_img, merged.shape[0])
    r = nms(merged[:, :4], merged[:, 4], iou_thr, k)
    out = jnp.concatenate([r.boxes, jnp.where(r.mask, r.scores,
                                              -jnp.inf)[:, None]], axis=1)
    return out, r.mask


def merge_aug_bboxes(aug_bboxes, aug_scores, img_metas, rcnn_test_cfg=None):
    """`merge_augs.py:83`: map per-aug (n, 4k) boxes back and average;
    scores averaged alongside (augs must share the proposal set)."""
    recovered = []
    for bboxes, img_info in zip(aug_bboxes, img_metas):
        m = _meta(img_info)
        recovered.append(bbox_mapping_back(
            jnp.asarray(bboxes), m["img_shape"], m["scale_factor"],
            m.get("flip", False), m.get("flip_direction", "horizontal")))
    boxes = jnp.stack(recovered).mean(axis=0)
    if aug_scores is None:
        return boxes
    return boxes, jnp.stack([jnp.asarray(s) for s in aug_scores]).mean(axis=0)


def merge_aug_scores(aug_scores):
    """`merge_augs.py:112`: plain mean."""
    if isinstance(aug_scores[0], jnp.ndarray):
        return jnp.stack(aug_scores).mean(axis=0)
    return np.mean(aug_scores, axis=0)


def merge_aug_masks(aug_masks, img_metas, rcnn_test_cfg=None,
                    weights: Optional[Sequence[float]] = None):
    """`merge_augs.py:120`: un-flip per-aug (n, C, h, w) mask probs and
    (weighted-)average."""
    recovered = []
    for mask, img_info in zip(aug_masks, img_metas):
        m = _meta(img_info)
        mask = np.asarray(mask)
        if m.get("flip", False):
            d = m.get("flip_direction", "horizontal")
            if d == "horizontal":
                mask = mask[..., ::-1]
            elif d == "vertical":
                mask = mask[..., ::-1, :]
            else:  # diagonal
                mask = mask[..., ::-1, ::-1]
        recovered.append(mask)
    if weights is None:
        return np.mean(recovered, axis=0)
    w = np.asarray(weights, np.float32)
    return np.tensordot(w, np.stack(recovered), axes=1) / w.sum()
