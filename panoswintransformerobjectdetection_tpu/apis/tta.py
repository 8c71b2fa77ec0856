"""Test-time augmentation (`MultiScaleFlipAug` + `aug_test` +
`merge_aug_bboxes` roles).

Host-side orchestration: each (scale, flip) variant runs the jitted
proposal / bbox sub-steps; proposals are merged in original-image
coordinates, then per-aug class scores and decoded boxes for the SHARED
proposal set are averaged (the reference's `merge_aug_bboxes` mean) and a
single multiclass NMS produces the final detections.
"""

from typing import List, Sequence, Tuple

import numpy as np


def aug_test_detector(det, variables, img: np.ndarray,
                      scales: Sequence[Tuple[int, int]] = ((800, 1333),),
                      flip: bool = True, num_classes=None):
    """img: HWC BGR float/uint8.  Returns DetResult-style numpy dict."""
    import cv2
    import jax
    import jax.numpy as jnp
    from ..data.transforms import Resize, Normalize, Pad, RandomFlip, Compose
    from ..ops.nms import batched_nms, multiclass_nms
    from ..core.bbox import flip_boxes

    num_classes = num_classes or det.num_classes
    H0, W0 = img.shape[:2]

    @jax.jit
    def props_fn(images, shapes):
        return det.apply(variables, images, shapes, method=det.extract_proposals)

    @jax.jit
    def bbox_fn(images, boxes, shapes):
        return det.apply(variables, images, boxes, shapes, method=det.bbox_for_rois)

    augs = []
    for scale in scales:
        for fl in ([False, True] if flip else [False]):
            pipeline = Compose([
                Resize(img_scale=scale),
                Normalize([123.675, 116.28, 103.53], [58.395, 57.12, 57.375]),
                Pad(32),
            ])
            r = {"img": img.astype(np.float32), "img_shape": img.shape,
                 "ori_shape": img.shape, "scale_factor": np.ones(4, np.float32)}
            r = pipeline(r)
            im = r["img"]
            if fl:
                im = np.ascontiguousarray(im[:, ::-1])
            augs.append((im, r["img_shape"], r["scale_factor"], fl))

    # stage 1: proposals per aug, mapped to original coords, then merged
    all_boxes, all_scores = [], []
    for im, shape, sf, fl in augs:
        images = jnp.asarray(im[None])
        shapes = jnp.asarray(np.array([[shape[0], shape[1]]], np.float32))
        p = props_fn(images, shapes)
        boxes = np.asarray(p.boxes[0])
        if fl:
            boxes = np.asarray(flip_boxes(jnp.asarray(boxes), shape[1]))
        boxes = boxes / sf[None, :]
        scores = np.where(np.asarray(p.mask[0]), np.asarray(p.scores[0]), -1e10)
        all_boxes.append(boxes)
        all_scores.append(scores)
    merged_boxes = np.concatenate(all_boxes)
    merged_scores = np.concatenate(all_scores)
    import jax.numpy as jnp2
    keep = batched_nms(jnp.asarray(merged_boxes), jnp.asarray(merged_scores),
                       jnp.zeros(len(merged_boxes), jnp.int32), 0.7,
                       min(1000, len(merged_boxes)),
                       jnp.asarray(merged_scores > -1e9))
    prop = np.asarray(keep.boxes)
    prop_mask = np.asarray(keep.mask)

    # stage 2: shared proposals through each aug's features; average
    agg_scores = agg_boxes = None
    for im, shape, sf, fl in augs:
        p_aug = prop * sf[None, :]
        if fl:
            p_aug = np.asarray(flip_boxes(jnp.asarray(p_aug), shape[1]))
        images = jnp.asarray(im[None])
        shapes = jnp.asarray(np.array([[shape[0], shape[1]]], np.float32))
        scores, dec = bbox_fn(images, jnp.asarray(p_aug[None]), shapes)
        dec = np.asarray(dec[0])
        k = dec.shape[-1] // 4
        dec = dec.reshape(-1, k, 4)
        if fl:
            dec = np.asarray(flip_boxes(jnp.asarray(dec), shape[1]))
        dec = (dec / sf[None, None, :]).reshape(-1, k * 4)
        s = np.asarray(scores[0])
        agg_scores = s if agg_scores is None else agg_scores + s
        agg_boxes = dec if agg_boxes is None else agg_boxes + dec
    agg_scores /= len(augs)
    agg_boxes /= len(augs)

    r = multiclass_nms(jnp.asarray(agg_boxes), jnp.asarray(agg_scores),
                       score_thr=0.05, iou_threshold=0.5, max_per_img=100,
                       valid=jnp.asarray(prop_mask))
    m = np.asarray(r.mask)
    return {"boxes": np.asarray(r.boxes)[m], "scores": np.asarray(r.scores)[m],
            "labels": np.asarray(r.labels)[m]}
