"""End-to-end learning evidence: overfitting a 2-image dataset must produce
real detections (mAP@0.5 on the train images above a floor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from panoswintransformerobjectdetection_tpu.core.evaluation import eval_map_coco


@pytest.mark.slow
def test_overfit_yields_detections(rng):
    from tests.test_detector import tiny_detector
    from panoswintransformerobjectdetection_tpu.runtime import (
        create_train_state, make_train_step, make_optimizer)

    det = tiny_detector()
    B, H, W = 2, 64, 128
    # strong distinctive box content so the tiny net can latch on
    imgs = np.full((B, H, W, 3), 0.1, np.float32)
    gtb = np.array([[[20, 12, 60, 48], [80, 20, 118, 56]],
                    [[10, 30, 50, 60], [70, 6, 110, 40]]], np.float32)
    for b in range(B):
        for (x1, y1, x2, y2) in gtb[b]:
            imgs[b, int(y1):int(y2), int(x1):int(x2)] = 0.9
    gtl = np.zeros((B, 2), np.int32)
    batch = {
        "images": jnp.asarray(imgs),
        "img_shapes": jnp.asarray([[H, W]] * B, jnp.float32),
        "gt_boxes": jnp.asarray(gtb),
        "gt_labels": jnp.asarray(gtl),
        "gt_valid": jnp.ones((B, 2), bool),
    }
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params0 = det.init(jax.random.PRNGKey(0), sample)["params"]
    tx = make_optimizer(params0, base_lr=1e-3, warmup_iters=10)
    state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)
    step = jax.jit(make_train_step(det))
    key = jax.random.PRNGKey(3)
    for _ in range(120):
        state, metrics = step(state, batch, key)

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def run(images, shapes, sf):
        return det.apply(variables, images, shapes, sf, method=det.simple_test)

    out = run(batch["images"], batch["img_shapes"], jnp.ones((B, 4), jnp.float32))
    dets, gts = [], []
    for i in range(B):
        m = np.asarray(out.mask[i])
        dets.append({"boxes": np.asarray(out.boxes[i])[m],
                     "scores": np.asarray(out.scores[i])[m],
                     "labels": np.asarray(out.labels[i])[m]})
        gts.append({"bboxes": gtb[i], "labels": gtl[i]})
    m = eval_map_coco(dets, gts, num_classes=5)
    assert m["bbox_mAP_50"] > 0.2, (m, [len(d["boxes"]) for d in dets],
                                    float(metrics["loss"]))


@pytest.mark.slow
def test_overfit_mask_rcnn_reports_segm_map(rng, tmp_path):
    """Mask R-CNN overfit: the full train->test->paste->RLE->COCOeval
    pipeline must report a real segm mAP (train-path mask evidence on top
    of the fixture-level evaluator tests)."""
    import json
    import cv2
    from tests.test_maskrcnn import tiny_mask_rcnn
    from panoswintransformerobjectdetection_tpu.runtime import (
        create_train_state, make_train_step, make_optimizer)
    from panoswintransformerobjectdetection_tpu.models.mask_head import (
        paste_masks)
    from panoswintransformerobjectdetection_tpu.data.datasets import (
        CocoStyleDataset)

    B, H, W = 2, 64, 128
    boxes_px = [[[20, 12, 60, 48], [80, 20, 118, 56]],
                [[10, 30, 50, 60], [70, 6, 110, 40]]]
    imgs = np.full((B, H, W, 3), 0.1, np.float32)
    gmasks = np.zeros((B, 2, H, W), np.float32)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, anns = [], []
    aid = 1
    for b in range(B):
        for g, (x1, y1, x2, y2) in enumerate(boxes_px[b]):
            imgs[b, y1:y2, x1:x2] = 0.9
            gmasks[b, g, y1:y2, x1:x2] = 1.0
            anns.append({"id": aid, "image_id": b, "category_id": 1,
                         "bbox": [x1, y1, x2 - x1, y2 - y1],
                         "area": float((x2 - x1) * (y2 - y1)), "iscrowd": 0,
                         "segmentation": [[x1, y1, x1, y2, x2, y2, x2, y1]]})
            aid += 1
        cv2.imwrite(str(img_dir / f"{b}.jpg"),
                    (imgs[b] * 255).astype(np.uint8))
        images.append({"id": b, "file_name": f"{b}.jpg",
                       "width": W, "height": H})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"},
                       {"id": 3, "name": "c"}]}))

    det = tiny_mask_rcnn()
    batch = {
        "images": jnp.asarray(imgs),
        "img_shapes": jnp.asarray([[H, W]] * B, jnp.float32),
        "gt_boxes": jnp.asarray(boxes_px, jnp.float32),
        "gt_labels": jnp.zeros((B, 2), jnp.int32),
        "gt_valid": jnp.ones((B, 2), bool),
        "gt_masks": jnp.asarray(gmasks),
    }
    sample = jnp.zeros((1, H, W, 3), jnp.float32)
    params0 = det.init(jax.random.PRNGKey(0), sample)["params"]
    tx = make_optimizer(params0, base_lr=1e-3, warmup_iters=10)
    state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)
    step = jax.jit(make_train_step(det))
    key = jax.random.PRNGKey(3)
    for _ in range(120):
        state, metrics = step(state, batch, key)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets, probs = jax.jit(
        lambda im, sh, sf: det.apply(variables, im, sh, sf,
                                     method=det.simple_test_masks))(
        batch["images"], batch["img_shapes"], jnp.ones((B, 4), jnp.float32))

    results = []
    for i in range(B):
        m = np.asarray(dets.mask[i])
        pasted = np.asarray(paste_masks(probs[i], dets.boxes[i], H, W))
        results.append({"boxes": np.asarray(dets.boxes[i])[m],
                        "scores": np.asarray(dets.scores[i])[m],
                        "labels": np.asarray(dets.labels[i])[m],
                        "masks": (pasted[m] > 0.5)})
    ds = CocoStyleDataset(str(ann_file), img_prefix=str(img_dir),
                          test_mode=True, classes=("a", "b", "c"))
    metrics = ds.evaluate(results, metric=["bbox", "segm"])
    assert metrics["bbox_mAP_50"] > 0.2, metrics
    assert metrics["segm_mAP_50"] > 0.2, metrics
