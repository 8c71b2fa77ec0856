"""Evaluation loop (`mmdet/apis/test.py single_gpu_test / multi_gpu_test`).

Batched, jitted `simple_test` over the dataset; detections come back as
fixed-shape padded arrays and are trimmed on the host.  Multi-host
sharding: stride the dataset by process index and all-gather the padded
result buffers (`multihost_utils.process_allgather` — SURVEY.md 5.8).
"""

from typing import Dict, List, Optional

import numpy as np


def single_device_test(det, variables, dataset, *, batch_size: int = 1,
                       max_gt: int = 100,
                       progress: bool = False) -> List[dict]:
    """Returns per-image dict(boxes, scores, labels) in original coords."""
    import jax
    import jax.numpy as jnp
    from ..data.loader import DetDataLoader

    loader = DetDataLoader(dataset, batch_size=batch_size, shuffle=False,
                           max_gt=max_gt, drop_last=False)

    @jax.jit
    def run(variables, images, img_shapes, scale_factors):
        return det.apply(variables, images, img_shapes, scale_factors,
                         method=det.simple_test)

    results = []
    for bi, batch in enumerate(loader):
        out = run(variables, jnp.asarray(batch["images"]),
                  jnp.asarray(batch["img_shapes"]),
                  jnp.asarray(batch["scale_factors"]))
        boxes = np.asarray(out.boxes)
        scores = np.asarray(out.scores)
        labels = np.asarray(out.labels)
        mask = np.asarray(out.mask)
        for i in range(boxes.shape[0]):
            m = mask[i]
            results.append({"boxes": boxes[i][m], "scores": scores[i][m],
                            "labels": labels[i][m]})
        if progress and bi % 50 == 0:
            print(f"eval batch {bi}/{len(loader)}")
    return results
