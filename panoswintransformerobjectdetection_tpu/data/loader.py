"""Batched loader: aspect-ratio grouping, static shape buckets, gt padding.

Replaces `mmdet/datasets/builder.py:75 build_dataloader` + `GroupSampler`
(`samplers/group_sampler.py:10`).  TPU twist: batches are padded to a
small fixed set of (H, W) buckets so every jit signature is reused —
multi-scale training cycles through the bucket set instead of arbitrary
shapes.  Distributed sharding = strided record slicing per host (the
`DistributedGroupSampler` role); device placement happens in the caller
via `parallel.shard_batch`.
"""

import math
import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def _round_up(x, m):
    return int(math.ceil(x / m) * m)


class DetDataLoader:
    def __init__(self, dataset, batch_size: int, max_gt: int = 100,
                 shuffle: bool = True, size_divisor: int = 32,
                 buckets: Optional[Sequence[Tuple[int, int]]] = None,
                 seed: int = 0, num_shards: int = 1, shard_id: int = 0,
                 drop_last: bool = True, num_workers: int = 0,
                 prefetch: int = 2):
        """num_workers > 0 enables threaded sample loading + background
        batch assembly (the `workers_per_gpu` role of the reference's
        `build_dataloader`, `mmdet/datasets/builder.py:75`) — cv2/numpy
        release the GIL, so threads overlap the host pipeline with device
        steps.  `prefetch` bounds the ready-batch queue."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.shuffle = shuffle
        self.size_divisor = size_divisor
        self.buckets = [tuple(b) for b in buckets] if buckets else None
        self.rng = random.Random(seed)
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)

    def _epoch_indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            # group by aspect-ratio flag, shuffle within groups (GroupSampler)
            flags = getattr(self.dataset, "flags", np.zeros(len(idx), np.uint8))
            groups = {}
            for i in idx:
                groups.setdefault(int(flags[i]), []).append(i)
            chunks = []
            for g in groups.values():
                self.rng.shuffle(g)
                for s in range(0, len(g) - len(g) % self.batch_size, self.batch_size):
                    chunks.append(g[s:s + self.batch_size])
            self.rng.shuffle(chunks)
            idx = [i for c in chunks for i in c]
        return idx[self.shard_id::self.num_shards]

    def _bucket_for(self, h, w) -> Tuple[int, int]:
        if self.buckets is None:
            return (_round_up(h, self.size_divisor), _round_up(w, self.size_divisor))
        for bh, bw in sorted(self.buckets):
            if h <= bh and w <= bw:
                return (bh, bw)
        return max(self.buckets)

    def _collate(self, samples: List[dict]) -> Dict[str, np.ndarray]:
        B = len(samples)
        hs = [s["img"].shape[0] for s in samples]
        ws = [s["img"].shape[1] for s in samples]
        bh, bw = self._bucket_for(max(hs), max(ws))
        images = np.zeros((B, bh, bw, 3), np.float32)
        img_shapes = np.zeros((B, 2), np.float32)
        scale_factors = np.ones((B, 4), np.float32)
        gt_boxes = np.zeros((B, self.max_gt, 4), np.float32)
        gt_labels = np.zeros((B, self.max_gt), np.int32)
        gt_valid = np.zeros((B, self.max_gt), bool)
        ori_shapes = np.zeros((B, 2), np.float32)
        pano_ratio_v = np.zeros((B, 3), np.float32)
        pano_ratio_v[:, 1] = 1.0
        with_masks = any("gt_masks" in s for s in samples)
        gt_masks = np.zeros((B, self.max_gt, bh, bw), np.uint8) \
            if with_masks else None
        for i, s in enumerate(samples):
            img = s["img"]
            images[i, :img.shape[0], :img.shape[1]] = img
            img_shapes[i] = img.shape[:2]
            scale_factors[i] = s.get("scale_factor", np.ones(4, np.float32))
            ori_shapes[i] = s.get("ori_shape", img.shape)[:2]
            prv = s.get("pano_ratio_v", np.array([0.0, 1.0], np.float32))
            pano_ratio_v[i, :2] = prv[:2]
            pano_ratio_v[i, 2] = img.shape[0]  # ori_h at network scale
            b = s.get("gt_bboxes")
            if b is not None and len(b):
                n = min(len(b), self.max_gt)
                gt_boxes[i, :n] = b[:n]
                gt_labels[i, :n] = s["gt_labels"][:n]
                gt_valid[i, :n] = True
                if gt_masks is not None and "gt_masks" in s and len(s["gt_masks"]):
                    m = s["gt_masks"][:n]
                    gt_masks[i, :n, :m.shape[1], :m.shape[2]] = m
        out = {"images": images, "img_shapes": img_shapes,
               "scale_factors": scale_factors, "ori_shapes": ori_shapes,
               "gt_boxes": gt_boxes, "gt_labels": gt_labels,
               "gt_valid": gt_valid, "pano_ratio_v": pano_ratio_v}
        if gt_masks is not None:
            out["gt_masks"] = gt_masks
        return out

    def _batch_of(self, chunk):
        if self.num_workers > 0:
            samples = list(self._pool.map(self.dataset.__getitem__, chunk))
        else:
            samples = [self.dataset[i] for i in chunk]
        samples = [x for x in samples if x is not None]
        if len(samples) < len(chunk):
            return None
        return self._collate(samples)

    def _chunks(self):
        idx = self._epoch_indices()
        end = len(idx) - len(idx) % self.batch_size if self.drop_last else len(idx)
        for s in range(0, end, self.batch_size):
            yield idx[s:s + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers <= 0:
            for chunk in self._chunks():
                b = self._batch_of(chunk)
                if b is not None:
                    yield b
            return
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor
        self._pool = ThreadPoolExecutor(self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        DONE = object()

        def producer():
            try:
                for chunk in self._chunks():
                    b = self._batch_of(chunk)
                    if b is not None:
                        q.put(b)
            finally:
                q.put(DONE)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is DONE:
                    break
                yield b
        finally:
            t.join(timeout=1.0)
            self._pool.shutdown(wait=False)

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)
