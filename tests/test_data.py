"""Data pipeline + dataset + loader + evaluation tests (host-side)."""

import json
import os
import time

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.data import (
    Resize, PanoResize, RandomFlip, Normalize, Pad, PanoStretch, RollAug,
    PanoCheck, Compose, StreetDataset, DetDataLoader,
)
from panoswintransformerobjectdetection_tpu.core.evaluation import (
    eval_map_coco, _average_precision,
)


def synth_results(h=64, w=128, n=3, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, w * 0.6, n)
    boxes[:, 1] = rng.uniform(0, h * 0.6, n)
    boxes[:, 2] = boxes[:, 0] + rng.uniform(4, w * 0.3, n)
    boxes[:, 3] = boxes[:, 1] + rng.uniform(4, h * 0.3, n)
    return {"img": img, "img_shape": img.shape, "ori_shape": img.shape,
            "gt_bboxes": boxes, "gt_labels": np.arange(n),
            "scale_factor": np.ones(4, np.float32)}


class TestTransforms:
    def test_resize_keep_ratio(self):
        r = synth_results()
        out = Resize(img_scale=(48, 1333))(r)
        assert out["img"].shape[0] == 48  # short side -> 48 (long side within cap)
        assert out["img"].shape[1] == 96
        assert (out["gt_bboxes"] <= max(out["img"].shape)).all()

    def test_pano_resize_full_width(self):
        r = synth_results(64, 128)
        out = PanoResize(img_scale=(32, 1333))(r)
        assert out["img"].shape[:2] == (32, 64)

    def test_flip_involution(self):
        r = synth_results()
        boxes0 = r["gt_bboxes"].copy()
        f = RandomFlip(flip_ratio=1.0)
        out = f(f(r))
        np.testing.assert_allclose(out["gt_bboxes"], boxes0, atol=1e-4)

    def test_normalize(self):
        r = synth_results()
        out = Normalize(mean=[10, 10, 10], std=[2, 2, 2], to_rgb=False)(r)
        assert abs(out["img"].mean() - (127.5 - 10) / 2) < 20

    def test_pad(self):
        r = synth_results(60, 100)
        out = Pad(size_divisor=32)(r)
        assert out["img"].shape[:2] == (64, 128)
        assert out["pad_shape"][:2] == (64, 128)

    def test_roll_aug_keeps_box_count_and_area(self):
        np.random.seed(0)
        import random as pyrandom
        pyrandom.seed(3)
        r = synth_results()
        n0 = len(r["gt_bboxes"])
        out = RollAug(chance=1.0)(r)
        assert len(out["gt_bboxes"]) == n0
        b = out["gt_bboxes"]
        assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= r["img"].shape[1]).all()

    def test_pano_stretch_identity(self):
        r = synth_results()
        from panoswintransformerobjectdetection_tpu.data.transforms import pano_stretch
        img, boxes = pano_stretch(r["img"], r["gt_bboxes"], 1.0, 1.0)
        np.testing.assert_allclose(img, r["img"], atol=1e-3)
        np.testing.assert_allclose(boxes, r["gt_bboxes"], atol=1e-2)

    def test_pano_stretch_warps(self):
        r = synth_results()
        from panoswintransformerobjectdetection_tpu.data.transforms import pano_stretch
        img, boxes = pano_stretch(r["img"], r["gt_bboxes"], 1.7, 1.0)
        assert img.shape == r["img"].shape
        assert np.isfinite(boxes).all()
        assert not np.allclose(boxes, r["gt_bboxes"])

    def test_pano_check(self):
        out = PanoCheck()(synth_results())
        np.testing.assert_array_equal(out["pano_ratio_v"], [0.0, 1.0])


@pytest.fixture
def coco_dir(tmp_path):
    import cv2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    rng = np.random.default_rng(0)
    for i in range(4):
        h, w = 64, 128
        fn = f"{i}.jpg"
        cv2.imwrite(str(img_dir / fn), (rng.random((h, w, 3)) * 255).astype(np.uint8))
        images.append({"id": i, "file_name": fn, "width": w, "height": h})
        for _ in range(3):
            x, y = rng.uniform(0, 60), rng.uniform(0, 30)
            bw, bh = rng.uniform(5, 30), rng.uniform(5, 20)
            annotations.append({"id": aid, "image_id": i,
                                "category_id": int(rng.integers(1, 6)),
                                "bbox": [float(x), float(y), float(bw), float(bh)],
                                "area": float(bw * bh), "iscrowd": 0})
            aid += 1
    cats = [{"id": j + 1, "name": n} for j, n in
            enumerate(("car", "crosswalk", "light", "traffic_sign", "warning_line"))]
    ann = {"images": images, "annotations": annotations, "categories": cats}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


class TestDataset:
    def test_street_dataset_and_loader(self, coco_dir):
        ann_file, img_dir = coco_dir
        from panoswintransformerobjectdetection_tpu.data import (
            LoadImageFromFile, LoadAnnotations)
        ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=[
            LoadImageFromFile(), LoadAnnotations(),
            Resize(img_scale=(48, 96)), Normalize([0, 0, 0], [255, 255, 255]),
            Pad(32),
        ])
        assert len(ds) == 4
        s = ds[0]
        assert s["img"].shape[2] == 3
        loader = DetDataLoader(ds, batch_size=2, max_gt=8)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["images"].shape[0] == 2
        assert b["gt_boxes"].shape == (2, 8, 4)
        assert b["gt_valid"].any()

    def test_perfect_detection_map(self, coco_dir):
        ann_file, img_dir = coco_dir
        ds = StreetDataset(ann_file, img_prefix=img_dir)
        dets = []
        for r in ds.records:
            dets.append({"boxes": r["bboxes"], "labels": r["labels"],
                         "scores": np.ones(len(r["labels"]), np.float32)})
        m = ds.evaluate(dets)
        assert m["bbox_mAP"] > 0.99
        assert m["bbox_mAP_50"] > 0.99


class TestEval:
    def test_ap_simple(self):
        tp = np.array([True, True, False, True])
        scores = np.array([0.9, 0.8, 0.7, 0.6])
        ap = _average_precision(tp, scores, num_gt=4)
        assert 0.5 < ap < 0.8

    def test_no_detections(self):
        gts = [{"bboxes": np.array([[0, 0, 10, 10.]]), "labels": np.array([0])}]
        dets = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "labels": np.zeros(0, int)}]
        m = eval_map_coco(dets, gts, num_classes=2)
        assert m["bbox_mAP"] == 0.0

    def test_wrong_class_penalized(self):
        gts = [{"bboxes": np.array([[0, 0, 10, 10.]]), "labels": np.array([0])}]
        good = [{"boxes": np.array([[0, 0, 10, 10.]]), "scores": np.array([0.9]),
                 "labels": np.array([0])}]
        bad = [{"boxes": np.array([[0, 0, 10, 10.]]), "scores": np.array([0.9]),
                "labels": np.array([1])}]
        assert eval_map_coco(good, gts, 2)["bbox_mAP"] == 1.0
        assert eval_map_coco(bad, gts, 2)["bbox_mAP"] == 0.0

    def test_localization_threshold(self):
        gts = [{"bboxes": np.array([[0, 0, 10, 10.]]), "labels": np.array([0])}]
        # IoU ~0.68 vs gt: counts at 0.5 but not at 0.7+
        dets = [{"boxes": np.array([[0, 0, 10, 14.5]]), "scores": np.array([0.9]),
                 "labels": np.array([0])}]
        m = eval_map_coco(dets, gts, 1)
        assert m["bbox_mAP_50"] == 1.0
        assert m["bbox_mAP_75"] == 0.0
        assert 0 < m["bbox_mAP"] < 1


class TestCropAndAutoAugment:
    def test_random_crop_bounds(self):
        import random as pyrandom
        from panoswintransformerobjectdetection_tpu.data.transforms import RandomCrop
        pyrandom.seed(0)
        r = synth_results(64, 128, n=5)
        out = RandomCrop(crop_size=(32, 48))(r)
        ch, cw = out["img"].shape[:2]
        assert 32 <= ch <= 64 and 32 <= cw <= 128
        b = out["gt_bboxes"]
        if len(b):
            assert (b[:, 0::2] <= cw).all() and (b[:, 1::2] <= ch).all()
            assert (b >= 0).all()
            assert len(out["gt_labels"]) == len(b)

    def test_autoaugment_policies(self):
        import random as pyrandom
        from panoswintransformerobjectdetection_tpu.data.transforms import AutoAugment
        pyrandom.seed(1)
        aug = AutoAugment(policies=[
            [dict(type="Resize", img_scale=(48, 96), keep_ratio=True)],
            [dict(type="Resize", img_scale=(32, 64), keep_ratio=True),
             dict(type="RandomCrop", crop_type="absolute_range",
                  crop_size=(16, 24), allow_negative_crop=True)],
        ])
        hs = set()
        for seed in range(8):
            pyrandom.seed(seed)
            out = aug(synth_results(64, 128))
            hs.add(out["img"].shape[0])
        assert len(hs) >= 2  # both policies exercised


class TestMaskPipeline:
    def test_masks_through_pipeline_and_loader(self, coco_dir, tmp_path):
        import json as _json
        import cv2
        from panoswintransformerobjectdetection_tpu.data import (
            LoadImageFromFile, LoadAnnotations, Resize, RandomFlip, Pad)
        ann_file, img_dir = coco_dir
        # add polygon segmentations to the fixture
        data = _json.load(open(ann_file))
        for a in data["annotations"]:
            x, y, w, h = a["bbox"]
            a["segmentation"] = [[x, y, x + w, y, x + w, y + h, x, y + h]]
        ann2 = tmp_path / "ann_mask.json"
        ann2.write_text(_json.dumps(data))
        ds = StreetDataset(str(ann2), img_prefix=img_dir, pipeline=[
            LoadImageFromFile(), LoadAnnotations(with_mask=True),
            Resize(img_scale=(48, 96)), RandomFlip(flip_ratio=1.0), Pad(32)])
        s = ds[0]
        assert "gt_masks" in s
        assert s["gt_masks"].shape[0] == len(s["gt_bboxes"])
        assert s["gt_masks"].shape[1:] == s["img"].shape[:2]
        # mask lies (mostly) inside its (flipped/resized) box
        for m, b in zip(s["gt_masks"], s["gt_bboxes"]):
            ys, xs = np.nonzero(m)
            if len(xs):
                assert xs.min() >= b[0] - 2 and xs.max() <= b[2] + 2
        loader = DetDataLoader(ds, batch_size=2, max_gt=8)
        batch = next(iter(loader))
        assert "gt_masks" in batch
        assert batch["gt_masks"].shape[:2] == (2, 8)
        assert batch["gt_masks"].any()


class TestLoaderPrefetch:
    """Threaded loader (`workers_per_gpu` role) must yield the same batches
    as the synchronous path, in order."""

    class _DS:
        def __init__(self, n=13):
            self.flags = np.zeros(n, np.uint8)
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"img": np.full((8, 10, 3), i, np.float32),
                    "gt_bboxes": np.array([[1.0, 1.0, 5.0, 5.0]], np.float32),
                    "gt_labels": np.array([0], np.int64)}

    def test_threaded_matches_sync(self):
        from panoswintransformerobjectdetection_tpu.data.loader import (
            DetDataLoader)
        a = DetDataLoader(self._DS(), batch_size=3, shuffle=True, seed=7)
        b = DetDataLoader(self._DS(), batch_size=3, shuffle=True, seed=7,
                          num_workers=4, prefetch=2)
        batches_a = list(a)
        batches_b = list(b)
        assert len(batches_a) == len(batches_b) == len(a)
        for x, y in zip(batches_a, batches_b):
            np.testing.assert_array_equal(x["images"], y["images"])
            np.testing.assert_array_equal(x["gt_boxes"], y["gt_boxes"])

    def test_iterating_twice(self):
        from panoswintransformerobjectdetection_tpu.data.loader import (
            DetDataLoader)
        dl = DetDataLoader(self._DS(), batch_size=3, shuffle=False,
                           num_workers=2)
        assert len(list(dl)) == len(list(dl)) == 4

    def test_abandoned_iteration_reaps_producer(self):
        """Breaking out of a prefetching epoch must stop the producer
        thread and its pool — no leaked thread blocked on a full queue."""
        import threading
        from panoswintransformerobjectdetection_tpu.data.loader import (
            DetDataLoader)
        before = threading.active_count()
        for _ in range(5):
            dl = DetDataLoader(self._DS(30), batch_size=2, shuffle=False,
                               num_workers=2, prefetch=1)
            it = iter(dl)
            next(it)
            it.close()  # what `break` in a for-loop does
        # producer threads + pool workers must all have wound down
        deadline = time.time() + 5.0
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 1

    def test_batches_carry_record_indices(self):
        from panoswintransformerobjectdetection_tpu.data.loader import (
            DetDataLoader)
        dl = DetDataLoader(self._DS(7), batch_size=3, shuffle=False,
                           drop_last=False)
        got = [list(b["indices"]) for b in dl]
        assert got == [[0, 1, 2], [3, 4, 5], [6]]


class TestInstaBoost:
    def test_jitters_instances_and_updates_boxes(self):
        """InstaBoost geometric core (reference configs/instaboost/):
        instance moves, box tracks the transformed mask, hole inpainted."""
        import random as _random
        from panoswintransformerobjectdetection_tpu.data.transforms import (
            InstaBoost)
        _random.seed(3)
        img = np.full((64, 64, 3), 128, np.float32)
        mask = np.zeros((64, 64), np.uint8)
        mask[20:36, 24:40] = 1
        img[20:36, 24:40] = 250.0
        results = {"img": img.copy(),
                   "gt_bboxes": np.array([[24, 20, 40, 36]], np.float32),
                   "gt_labels": np.array([0]),
                   "gt_masks": mask[None].copy()}
        tr = InstaBoost(aug_ratio=1.0, scale=(1.0, 1.0), theta=(0, 0),
                        dx=4, dy=4)
        out = tr(results)
        m2 = out["gt_masks"][0]
        assert m2.sum() > 0
        b2 = out["gt_bboxes"][0]
        ys, xs = np.nonzero(m2)
        np.testing.assert_allclose(
            b2, [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        # pasted pixels carry the instance appearance
        assert out["img"][m2 > 0].mean() > 200

    def test_skip_and_no_mask_paths(self):
        from panoswintransformerobjectdetection_tpu.data.transforms import (
            InstaBoost)
        tr = InstaBoost(aug_ratio=1.0,
                        action_candidate=("skip",), action_prob=(1,))
        img = np.zeros((16, 16, 3), np.float32)
        r = {"img": img, "gt_bboxes": np.zeros((0, 4), np.float32),
             "gt_labels": np.zeros((0,), np.int64),
             "gt_masks": np.zeros((0, 16, 16), np.uint8)}
        assert tr(r) is r
        mask = np.zeros((16, 16), np.uint8)
        mask[4:8, 4:8] = 1
        r2 = {"img": img.copy(),
              "gt_bboxes": np.array([[4, 4, 8, 8]], np.float32),
              "gt_labels": np.array([0]), "gt_masks": mask[None]}
        out = tr(r2)  # all actions 'skip' -> unchanged
        np.testing.assert_array_equal(out["gt_masks"][0], mask)


class TestBuilderApi:
    """`mmdet/datasets` builder/util API parity (`builder.py:53,75`,
    `utils.py:13,73`, `dataset_wrappers.py ConcatDataset`)."""

    def test_build_dataset_concat_list_cfg(self, coco_dir):
        from panoswintransformerobjectdetection_tpu.data import build_dataset
        ann, imgs = coco_dir
        sub = dict(type="StreetDataset", ann_file=ann, img_prefix=imgs,
                   pipeline=[dict(type="LoadImageFromFile")])
        ds = build_dataset([sub, sub])
        assert len(ds) == 8 and ds.CLASSES[0] == "car"

    def test_build_dataset_list_ann_file(self, coco_dir):
        from panoswintransformerobjectdetection_tpu.data import build_dataset
        ann, imgs = coco_dir
        ds = build_dataset(dict(type="StreetDataset", ann_file=[ann, ann],
                                img_prefix=[imgs, imgs],
                                pipeline=[dict(type="LoadImageFromFile")]))
        assert len(ds) == 8

    def test_concat_separate_eval(self, coco_dir):
        from panoswintransformerobjectdetection_tpu.data import build_dataset
        ann, imgs = coco_dir
        ds = build_dataset(dict(type="StreetDataset", ann_file=[ann, ann],
                                img_prefix=imgs, test_mode=True,
                                pipeline=[dict(type="LoadImageFromFile")]))
        perfect = []
        for d in (ds.datasets[0], ds.datasets[1]):
            for r in d.records:
                perfect.append({"boxes": r["bboxes"],
                                "scores": np.ones(len(r["bboxes"]), np.float32),
                                "labels": r["labels"]})
        out = ds.evaluate(perfect)
        assert out["0_bbox_mAP"] > 0.95 and out["1_bbox_mAP"] > 0.95

    def test_build_dataloader(self, coco_dir):
        from panoswintransformerobjectdetection_tpu.data import (
            build_dataset, build_dataloader)
        ann, imgs = coco_dir
        ds = build_dataset(dict(
            type="StreetDataset", ann_file=ann, img_prefix=imgs,
            pipeline=[dict(type="LoadImageFromFile"),
                      dict(type="LoadAnnotations", with_bbox=True),
                      dict(type="Pad", size_divisor=32)]))
        loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=0)
        batch = next(iter(loader))
        assert batch["images"].shape[0] == 2

    def test_replace_image_to_tensor(self):
        from panoswintransformerobjectdetection_tpu.data import replace_ImageToTensor
        pipe = [dict(type="LoadImageFromFile"),
                dict(type="MultiScaleFlipAug", img_scale=(64, 32), flip=False,
                     transforms=[dict(type="Resize", keep_ratio=True),
                                 dict(type="ImageToTensor", keys=["img"])])]
        out = replace_ImageToTensor(pipe)
        assert out[1]["transforms"][1] == {"type": "DefaultFormatBundle"}
        assert pipe[1]["transforms"][1]["type"] == "ImageToTensor"  # no mutation

    def test_get_loading_pipeline(self):
        from panoswintransformerobjectdetection_tpu.data import get_loading_pipeline
        pipe = [dict(type="LoadImageFromFile"),
                dict(type="LoadAnnotations", with_bbox=True),
                dict(type="Resize", img_scale=(64, 32)),
                dict(type="Normalize", mean=[0] * 3, std=[1] * 3)]
        out = get_loading_pipeline(pipe)
        assert [p["type"] for p in out] == ["LoadImageFromFile",
                                            "LoadAnnotations"]

    def test_lvis_xml_aliases_registered(self):
        from panoswintransformerobjectdetection_tpu.data import DATASETS
        for k in ("LVISV05Dataset", "LVISV1Dataset", "XMLDataset"):
            assert k in DATASETS

    def test_model_builders(self):
        from panoswintransformerobjectdetection_tpu.models import (
            build_backbone, build_detector, build_loss)
        bb = build_backbone(dict(type="ResNet", depth=18))
        assert bb is not None
        det = build_detector(dict(type="FasterRCNN", num_classes=3,
                                  backbone=dict(type="ResNet", depth=18),
                                  neck=dict(in_channels=(64, 128, 256, 512),
                                            out_channels=32)),
                             test_cfg=dict(rcnn=dict(max_per_img=8)))
        assert det.test_cfg["rcnn"]["max_per_img"] == 8
        import jax.numpy as jnp
        f = build_loss(dict(type="GIoULoss", loss_weight=10.0))
        z = f(jnp.array([[0., 0., 2., 2.]]), jnp.array([[0., 0., 2., 2.]]))
        assert abs(float(z)) < 1e-5
