"""API-level tests: config loading/building (the reference's
`test_runtime/test_config.py` role), train/eval loop smoke on synthetic data."""

import glob
import json
import os

import numpy as np
import pytest

from panoswintransformerobjectdetection_tpu.runtime.config import (
    load_config, merge_dict, set_by_dotted)
from panoswintransformerobjectdetection_tpu.apis.inference import (
    build_detector_from_cfg)

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")


class TestConfig:
    def test_merge_dict(self):
        base = {"a": {"x": 1, "y": 2}, "b": 3}
        new = {"a": {"y": 5}, "c": 6}
        out = merge_dict(base, new)
        assert out == {"a": {"x": 1, "y": 5}, "b": 3, "c": 6}

    def test_delete_key(self):
        base = {"m": {"type": "A", "depth": 4}}
        new = {"m": {"_delete_": True, "type": "B"}}
        assert merge_dict(base, new)["m"] == {"type": "B"}

    def test_set_by_dotted(self):
        cfg = {"model": {"backbone": {"embed_dim": 96}}}
        set_by_dotted(cfg, "model.backbone.embed_dim", 64)
        assert cfg["model"]["backbone"]["embed_dim"] == 64

    @pytest.mark.slow
    @pytest.mark.parametrize("path", sorted(
        glob.glob(os.path.join(CONFIG_ROOT, "*", "*.py"))))
    def test_every_config_builds(self, path):
        # mirrors the reference's test_config.py: every leaf config must
        # load (with _base_ inheritance) and instantiate its model.
        # ~500 leaf configs x ~0.7 s dominate the quick tier, so the full
        # sweep is slow-marked (scheduled CI); the quick tier keeps one
        # representative config per method family below.
        if "_base_" in path:
            pytest.skip("base fragment")
        cfg = load_config(path)
        assert "model" in cfg
        det = build_detector_from_cfg(cfg)
        assert det is not None

    @pytest.mark.parametrize("family", sorted({
        os.path.basename(os.path.dirname(p)) for p in
        glob.glob(os.path.join(CONFIG_ROOT, "*", "*.py"))} - {"_base_"}))
    def test_one_config_per_family_builds(self, family):
        # quick-tier smoke: the first leaf config of every method family
        paths = sorted(glob.glob(os.path.join(CONFIG_ROOT, family, "*.py")))
        cfg = load_config(paths[0])
        assert "model" in cfg
        assert build_detector_from_cfg(cfg) is not None


@pytest.fixture
def tiny_cfg_and_data(tmp_path):
    import cv2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        h, w = 64, 128
        fn = f"{i}.jpg"
        cv2.imwrite(str(img_dir / fn), (rng.random((h, w, 3)) * 255).astype(np.uint8))
        images.append({"id": i, "file_name": fn, "width": w, "height": h})
        for _ in range(2):
            x, y = rng.uniform(0, 60), rng.uniform(0, 30)
            annotations.append({"id": aid, "image_id": i, "category_id": 1,
                                "bbox": [float(x), float(y), 20.0, 15.0],
                                "area": 300.0, "iscrowd": 0,
                                "segmentation": [[
                                    float(x), float(y), float(x), float(y + 15),
                                    float(x + 20), float(y + 15),
                                    float(x + 20), float(y)]]})
            aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "car"},
                          {"id": 2, "name": "crosswalk"},
                          {"id": 3, "name": "light"},
                          {"id": 4, "name": "traffic_sign"},
                          {"id": 5, "name": "warning_line"}]}
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


class TestTrainEvalLoop:
    def test_train_then_eval(self, tiny_cfg_and_data, tmp_path):
        ann_file, img_dir = tiny_cfg_and_data
        from panoswintransformerobjectdetection_tpu.models import DETECTORS, build
        from panoswintransformerobjectdetection_tpu.data import (
            StreetDataset, LoadImageFromFile, LoadAnnotations, Normalize, Pad)
        from panoswintransformerobjectdetection_tpu.apis.train import train_detector
        from panoswintransformerobjectdetection_tpu.apis.test import single_device_test

        det = build(DETECTORS, {
            "type": "PanoFasterRCNN",
            "backbone": {"type": "PanoSwinTransformer", "embed_dim": 6,
                         "depths": (1, 1, 1, 1), "num_heads": (1, 1, 1, 2),
                         "window_size": 4, "ape": True, "drop_path_rate": 0.0},
            "neck": {"type": "FPN", "in_channels": (6, 12, 24, 48),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 5,
            "train_cfg": {
                "rpn": {"pos_iou_thr": 0.7, "neg_iou_thr": 0.3, "min_pos_iou": 0.3,
                        "num_samples": 32, "pos_fraction": 0.5},
                "rpn_proposal": {"nms_pre": 64, "max_per_img": 16,
                                 "iou_threshold": 0.7, "min_bbox_size": 0},
                "rcnn": {"pos_iou_thr": 0.5, "neg_iou_thr": 0.5, "min_pos_iou": 0.5,
                         "num_samples": 16, "pos_fraction": 0.25},
            },
            "test_cfg": {
                "rpn": {"nms_pre": 32, "max_per_img": 8, "iou_threshold": 0.7,
                        "min_bbox_size": 0},
                "rcnn": {"score_thr": 0.05, "iou_threshold": 0.5, "max_per_img": 8},
            },
        })
        pipeline = [LoadImageFromFile(), LoadAnnotations(),
                    Normalize([0, 0, 0], [255, 255, 255]), Pad(32)]
        ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=pipeline)
        work_dir = str(tmp_path / "wd")
        state = train_detector(det, ds, work_dir=work_dir, total_epochs=1,
                               batch_size=2, max_gt=8, log_interval=1,
                               warmup_iters=2, checkpoint_interval=1)
        assert int(state.step) == 2
        assert os.path.exists(os.path.join(work_dir, "train.log.json"))
        assert os.path.exists(os.path.join(work_dir, "epoch_1"))

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        test_ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=pipeline,
                                test_mode=True)
        results = single_device_test(det, variables, test_ds, batch_size=2,
                                     max_gt=8)
        assert len(results) == 4
        metrics = test_ds.evaluate(results)
        assert "bbox_mAP" in metrics

    def test_checkpoint_roundtrip(self, tiny_cfg_and_data, tmp_path):
        import jax
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.runtime import (
            create_train_state, make_optimizer)
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            save_checkpoint, load_checkpoint)
        from panoswintransformerobjectdetection_tpu.models import DETECTORS, build

        det = build(DETECTORS, {
            "type": "FasterRCNN",
            "backbone": {"type": "PanoSwinTransformer", "embed_dim": 6,
                         "depths": (1, 1), "num_heads": (1, 2),
                         "window_size": 4, "out_indices": (0, 1),
                         "drop_path_rate": 0.0},
            "neck": {"type": "FPN", "in_channels": (6, 12), "out_channels": 8,
                     "num_outs": 5},
            "num_classes": 2, "featmap_strides": (4, 8, 8, 8),
        })
        sample = jnp.zeros((1, 32, 64, 3), jnp.float32)
        tx = make_optimizer(det.init(jax.random.PRNGKey(0), sample)["params"])
        state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)
        state = state.replace(step=state.step + 7)
        path = str(tmp_path / "ckpt")
        save_checkpoint(os.path.abspath(path), state)
        state2 = create_train_state(det, jax.random.PRNGKey(1), sample, tx)
        state2 = load_checkpoint(os.path.abspath(path), state2)
        assert int(state2.step) == 7
        l1 = jax.tree_util.tree_leaves(state.params)
        l2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestMultiHostEval:
    def test_single_process_path(self, tiny_cfg_and_data):
        """multi_host_test on 1 process == single_device_test results."""
        import jax
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.apis.test import (
            single_device_test, multi_host_test)
        from panoswintransformerobjectdetection_tpu.data import (
            StreetDataset, LoadImageFromFile, LoadAnnotations, Normalize, Pad)
        from tests.test_detector import tiny_detector

        ann_file, img_dir = tiny_cfg_and_data
        det = tiny_detector()
        variables = det.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))
        pipeline = [LoadImageFromFile(), LoadAnnotations(),
                    Normalize([0, 0, 0], [255, 255, 255]), Pad(32)]
        ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=pipeline,
                           test_mode=True)
        a = single_device_test(det, variables, ds, batch_size=2, max_gt=8)
        b = multi_host_test(det, variables, ds, batch_size=2, max_gt=8)
        assert len(a) == len(b) == len(ds)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x["boxes"], y["boxes"], atol=1e-5)


class TestHooks:
    def test_hooks_called(self, tiny_cfg_and_data, tmp_path):
        from panoswintransformerobjectdetection_tpu.runtime.hooks import Hook
        from panoswintransformerobjectdetection_tpu.apis.train import train_detector
        from panoswintransformerobjectdetection_tpu.data import (
            StreetDataset, LoadImageFromFile, LoadAnnotations, Normalize, Pad)
        from tests.test_detector import tiny_detector

        calls = []

        class Spy(Hook):
            def before_train(self, ctx):
                calls.append("before_train")

            def after_iter(self, ctx):
                calls.append(("iter", ctx["step"], "loss" in ctx["metrics"]))

            def after_epoch(self, ctx):
                calls.append("after_epoch")

        ann_file, img_dir = tiny_cfg_and_data
        det = tiny_detector()
        ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=[
            LoadImageFromFile(), LoadAnnotations(),
            Normalize([0, 0, 0], [255, 255, 255]), Pad(32)])
        train_detector(det, ds, work_dir=str(tmp_path / "wd"), total_epochs=1,
                       batch_size=2, max_gt=8, log_interval=10,
                       checkpoint_interval=10, hooks=[Spy()])
        assert calls[0] == "before_train"
        assert calls[-1] == "after_epoch"
        iters = [c for c in calls if isinstance(c, tuple)]
        assert len(iters) == 2 and all(c[2] for c in iters)


class TestSegmEval:
    def test_mask_rcnn_segm_e2e(self, tiny_cfg_and_data):
        """simple_test_masks -> host paste -> RLE -> COCOeval segm metrics
        (the reference's `tools/test.py --eval segm` path)."""
        ann_file, img_dir = tiny_cfg_and_data
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        from panoswintransformerobjectdetection_tpu.data import (
            StreetDataset, LoadImageFromFile, LoadAnnotations, Normalize, Pad)
        from panoswintransformerobjectdetection_tpu.apis.test import (
            single_device_test)
        from panoswintransformerobjectdetection_tpu.core import rle as rle_utils
        import jax

        det = build(DETECTORS, {
            "type": "MaskRCNN",
            "backbone": {"type": "ResNet", "depth": 18},
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 5,
            "mask_roi_size": 6,
            "test_cfg": {
                "rpn": {"nms_pre": 32, "max_per_img": 8, "iou_threshold": 0.7,
                        "min_bbox_size": 0},
                "rcnn": {"score_thr": 0.0, "iou_threshold": 0.5,
                         "max_per_img": 4},
            },
        })
        pipeline = [LoadImageFromFile(), LoadAnnotations(),
                    Normalize([0, 0, 0], [255, 255, 255]), Pad(32)]
        ds = StreetDataset(ann_file, img_prefix=img_dir, pipeline=pipeline,
                           test_mode=True)
        import jax.numpy as jnp
        variables = det.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 128, 3), jnp.float32))
        results = single_device_test(det, variables, ds, batch_size=2,
                                     with_masks=True)
        assert len(results) == len(ds)
        for r in results:
            assert "masks" in r
            assert len(r["masks"]) == len(r["boxes"])
            for m in r["masks"]:
                assert m["size"] == [64, 128]
                # decodable
                assert rle_utils.decode(m).shape == (64, 128)
        metrics = ds.evaluate(results, metric=["bbox", "segm"])
        for k in ("bbox_mAP", "bbox_mAP_50", "segm_mAP", "segm_mAP_50",
                  "bbox_mAP_s", "segm_AR@100"):
            assert k in metrics, k
        # untrained model: metrics are defined (>= 0), not asserted high
        assert metrics["segm_mAP"] >= 0.0


class TestInitWeights:
    def test_pretrained_backbone_and_load_from(self, tmp_path, monkeypatch):
        """cfg.load_from / model.pretrained weight-init semantics
        (`mmcv_custom/checkpoint.py:240-300` role)."""
        torch = pytest.importorskip("torch")
        import jax
        import jax.numpy as jnp
        from test_converters import TestResNetConverter
        from panoswintransformerobjectdetection_tpu.models import (
            DETECTORS, build)
        from panoswintransformerobjectdetection_tpu.apis.train import (
            _apply_init_weights)
        from panoswintransformerobjectdetection_tpu.runtime import (
            create_train_state, make_optimizer)

        det = build(DETECTORS, {
            "type": "FasterRCNN",
            "backbone": {"type": "ResNet", "depth": 18},
            "neck": {"type": "FPN", "in_channels": (64, 128, 256, 512),
                     "out_channels": 16, "num_outs": 5},
            "num_classes": 3,
        })
        sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
        params = det.init(jax.random.PRNGKey(0), sample)["params"]
        tx = make_optimizer(params, base_lr=1e-3, weight_decay=0.0,
                            warmup_iters=1, decay_steps=(10,))
        state = create_train_state(det, jax.random.PRNGKey(0), sample, tx)

        with torch.no_grad():
            tm = TestResNetConverter._torch_resnet18()
        # torch.save/load file IO is torch's own; stub the state-dict
        # fetch and test the conversion + state wiring
        from panoswintransformerobjectdetection_tpu.runtime import (
            checkpoint as ck)
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        monkeypatch.setattr(ck, "load_torch_state_dict", lambda p: sd)

        st2 = _apply_init_weights(det, state, pretrained="r18.pth")
        want = np.asarray(tm.conv1.weight.detach()).transpose(2, 3, 1, 0)
        got = np.asarray(st2.params["backbone_m"]["conv1"]["kernel"])
        np.testing.assert_allclose(got, want, atol=1e-6)
        # non-backbone params untouched
        assert st2.params.keys() == state.params.keys()

        # load_from: whole-detector orbax weights round-trip
        import orbax.checkpoint as ocp
        ck = str(tmp_path / "full_ckpt")
        ocp.PyTreeCheckpointer().save(
            os.path.abspath(ck),
            {"params": jax.device_get(st2.params),
             "batch_stats": jax.device_get(st2.batch_stats)}, force=True)
        st3 = _apply_init_weights(det, state, load_from=ck)
        got3 = np.asarray(st3.params["backbone_m"]["conv1"]["kernel"])
        np.testing.assert_allclose(got3, want, atol=1e-6)


class TestReferenceApiSurface:
    """The `mmdet.apis` __all__ parity: every reference-exported symbol is
    importable and behaves (reference `mmdet/apis/__init__.py`)."""

    def test_all_exports(self):
        from panoswintransformerobjectdetection_tpu import apis
        for name in ("get_root_logger", "set_random_seed", "train_detector",
                     "init_detector", "async_inference_detector",
                     "inference_detector", "show_result_pyplot",
                     "single_device_test", "multi_host_test"):
            assert hasattr(apis, name), name

    def test_set_random_seed(self):
        from panoswintransformerobjectdetection_tpu.apis import set_random_seed
        key = set_random_seed(7)
        a = np.random.rand(3)
        set_random_seed(7)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)
        assert key is not None

    def test_show_result_pyplot_renders(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg")
        from panoswintransformerobjectdetection_tpu.apis import show_result_pyplot
        img = np.zeros((40, 60, 3), np.uint8)
        # per-class list format from inference_detector: 2 classes
        result = [np.array([[5, 5, 25, 20, 0.9]], np.float32),
                  np.zeros((0, 5), np.float32)]
        out = str(tmp_path / "vis.jpg")
        drawn = show_result_pyplot(None, img, result, score_thr=0.3,
                                   class_names=("a", "b"), out_file=out)
        assert drawn.shape == img.shape and os.path.exists(out)
        assert drawn.sum() > 0  # something was drawn

    def test_async_inference_wraps_sync(self, monkeypatch):
        import asyncio
        from panoswintransformerobjectdetection_tpu.apis import inference as inf
        monkeypatch.setattr(inf, "inference_detector",
                            lambda det, v, img, pipeline=None,
                            num_classes=None: "sentinel")
        got = asyncio.run(inf.async_inference_detector(None, None, None))
        assert got == "sentinel"
