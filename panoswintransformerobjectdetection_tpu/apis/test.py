"""Evaluation loop (`mmdet/apis/test.py single_gpu_test / multi_gpu_test`).

Batched, jitted `simple_test` over the dataset; detections come back as
fixed-shape padded arrays and are trimmed on the host.  Multi-host
sharding: stride the dataset by process index and all-gather the padded
result buffers (`multihost_utils.process_allgather` — SURVEY.md 5.8).
"""

from typing import Dict, List, Optional

import numpy as np


def single_device_test(det, variables, dataset, *, batch_size: int = 1,
                       max_gt: int = 100, with_masks: bool = False,
                       progress: bool = False) -> List[dict]:
    """Returns per-image dict(boxes, scores, labels[, masks]) in original
    coords.  `with_masks` runs `simple_test_masks` and pastes each
    detection's RoI mask to the original image size on the host, returning
    RLE dicts (the reference's `_segm2json` path, `coco.py:235`)."""
    import jax
    import jax.numpy as jnp
    from ..data.loader import DetDataLoader
    from ..core import rle as rle_utils
    from ..models.mask_head import paste_masks

    loader = DetDataLoader(dataset, batch_size=batch_size, shuffle=False,
                           max_gt=max_gt, drop_last=False)

    @jax.jit
    def run(variables, images, img_shapes, scale_factors):
        if with_masks:
            return det.apply(variables, images, img_shapes, scale_factors,
                             method=det.simple_test_masks)
        return det.apply(variables, images, img_shapes, scale_factors,
                         method=det.simple_test)

    paste_jit = jax.jit(paste_masks, static_argnums=(2, 3))

    # results keyed by the record indices the loader carries through each
    # batch, so a skipped sample misaligns loudly instead of silently
    # shifting every subsequent detection onto the wrong image
    by_index = {}
    for bi, batch in enumerate(loader):
        out = run(variables, jnp.asarray(batch["images"]),
                  jnp.asarray(batch["img_shapes"]),
                  jnp.asarray(batch["scale_factors"]))
        mask_probs = None
        if with_masks:
            out, mask_probs = out
        boxes = np.asarray(out.boxes)
        scores = np.asarray(out.scores)
        labels = np.asarray(out.labels)
        mask = np.asarray(out.mask)
        indices = batch["indices"]
        for i in range(boxes.shape[0]):
            idx = int(indices[i])
            m = mask[i]
            res = {"boxes": boxes[i][m], "scores": scores[i][m],
                   "labels": labels[i][m]}
            if mask_probs is not None:
                rec = dataset.records[idx]
                oh, ow = int(rec["height"]), int(rec["width"])
                bitmaps = np.asarray(paste_jit(
                    mask_probs[i], jnp.asarray(boxes[i]), oh, ow))
                res["masks"] = [rle_utils.encode(np.asarray(b) > 0)
                                for b in bitmaps[m]]
            by_index[idx] = res
        if progress and bi % 50 == 0:
            print(f"eval batch {bi}/{len(loader)}")
    missing = [i for i in range(len(dataset)) if i not in by_index]
    if missing:
        raise RuntimeError(
            f"eval loader skipped {len(missing)} sample(s) "
            f"(first: {missing[:5]}); results would misalign with "
            "dataset.records")
    return [by_index[i] for i in range(len(dataset))]


def multi_host_test(det, variables, dataset, *, batch_size: int = 1,
                    max_gt: int = 100) -> Optional[List[dict]]:
    """Distributed eval (`multi_gpu_test` + `collect_results` role,
    SURVEY.md 5.8): each host evaluates a strided shard, padded fixed-shape
    result buffers are all-gathered with `process_allgather`, and host 0
    returns the merged per-image detections (others get None)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from ..data.loader import DetDataLoader

    nproc = jax.process_count()
    pid = jax.process_index()
    loader = DetDataLoader(dataset, batch_size=batch_size, shuffle=False,
                           max_gt=max_gt, drop_last=False,
                           num_shards=nproc, shard_id=pid)

    @jax.jit
    def run(variables, images, img_shapes, scale_factors):
        return det.apply(variables, images, img_shapes, scale_factors,
                         method=det.simple_test)

    boxes, scores, labels, masks = [], [], [], []
    for batch in loader:
        out = run(variables, jnp.asarray(batch["images"]),
                  jnp.asarray(batch["img_shapes"]),
                  jnp.asarray(batch["scale_factors"]))
        out = jax.device_get(out)
        boxes.append(out.boxes)
        scores.append(out.scores)
        labels.append(out.labels)
        masks.append(out.mask)
    local = {
        "boxes": np.concatenate(boxes) if boxes else np.zeros((0, 1, 4)),
        "scores": np.concatenate(scores) if scores else np.zeros((0, 1)),
        "labels": np.concatenate(labels) if labels else np.zeros((0, 1), np.int32),
        "mask": np.concatenate(masks) if masks else np.zeros((0, 1), bool),
    }

    n_total = len(dataset)
    if nproc > 1:
        # pad every host's shard to the same length, then allgather
        shard_max = -(-n_total // nproc)
        def padshard(x):
            pad = shard_max - x.shape[0]
            if pad > 0:
                x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
            return x[:shard_max]
        local = {k: padshard(v) for k, v in local.items()}
        gathered = multihost_utils.process_allgather(local, tiled=False)
        if pid != 0:
            return None
        results = []
        for g in range(n_total):
            h, pos = g % nproc, g // nproc
            m = np.asarray(gathered["mask"][h][pos])
            results.append({
                "boxes": np.asarray(gathered["boxes"][h][pos])[m],
                "scores": np.asarray(gathered["scores"][h][pos])[m],
                "labels": np.asarray(gathered["labels"][h][pos])[m]})
        return results

    results = []
    for i in range(min(local["boxes"].shape[0], n_total)):
        m = local["mask"][i]
        results.append({"boxes": local["boxes"][i][m],
                        "scores": local["scores"][i][m],
                        "labels": local["labels"][i][m]})
    return results
