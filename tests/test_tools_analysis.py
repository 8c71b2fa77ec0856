"""Analysis tools + multi-source checkpoints (VERDICT r1 items 8/9):
corruption suite, robustness benchmark, error analysis, checkpoint URL /
torchvision resolution — all on synthetic inputs."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from panoswintransformerobjectdetection_tpu.data.corruptions import (
    BENCHMARK_CORRUPTIONS, Corrupt, corrupt)


class TestCorruptions:
    def test_all_corruptions_shape_dtype(self, rng):
        img = (rng.random((48, 96, 3)) * 255).astype(np.uint8)
        for name in BENCHMARK_CORRUPTIONS:
            for sev in (1, 5):
                out = corrupt(img, name, sev)
                assert out.shape == img.shape, name
                assert out.dtype == np.uint8, name
        # severity must change pixels
        assert (corrupt(img, "gaussian_noise", 3) != img).any()

    def test_transform_wrapper_float(self, rng):
        img = (rng.random((32, 32, 3)) * 255).astype(np.float32)
        r = Corrupt("pixelate", 3)({"img": img})
        assert r["img"].dtype == np.float32
        assert r["img"].shape == img.shape

    def test_severity_zero_noop(self, rng):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        r = Corrupt("fog", 0)({"img": img})
        np.testing.assert_array_equal(r["img"], img)


class TestResolveCheckpoint:
    def test_file_passthrough(self, tmp_path):
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            resolve_checkpoint)
        p = tmp_path / "x.pth"
        p.write_bytes(b"")
        assert resolve_checkpoint(str(p)) == str(p)

    def test_torchvision_unknown(self):
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            resolve_checkpoint)
        with pytest.raises(KeyError):
            resolve_checkpoint("torchvision://nonexistent_model")

    def test_url_download_cached(self, tmp_path, monkeypatch):
        import urllib.request
        from panoswintransformerobjectdetection_tpu.runtime import (
            checkpoint as ck)
        monkeypatch.setenv("TORCH_HOME", str(tmp_path))
        calls = []

        def fake_retrieve(url, dst):
            calls.append(url)
            with open(dst, "wb") as f:
                f.write(b"payload")

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        local = ck.resolve_checkpoint("https://example.com/model.pth")
        assert open(local, "rb").read() == b"payload"
        # second resolve hits the cache, no new download
        local2 = ck.resolve_checkpoint("https://example.com/model.pth")
        assert local2 == local and len(calls) == 1
        # torchvision:// resolves through the zoo table to the same flow
        local3 = ck.resolve_checkpoint("torchvision://resnet50")
        assert os.path.exists(local3) and len(calls) == 2


@pytest.fixture
def tool_fixture(tmp_path):
    """Tiny on-disk dataset + config usable by the analysis tools."""
    import cv2
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations, aid = [], [], 1
    for i in range(2):
        h, w = 64, 96
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    (rng.random((h, w, 3)) * 255).astype(np.uint8))
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": w, "height": h})
        annotations.append({"id": aid, "image_id": i, "category_id": 1,
                            "bbox": [10, 10, 20, 15], "area": 300.0,
                            "iscrowd": 0})
        aid += 1
    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "car"},
                          {"id": 2, "name": "crosswalk"},
                          {"id": 3, "name": "light"},
                          {"id": 4, "name": "traffic_sign"},
                          {"id": 5, "name": "warning_line"}]}
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    cfg = tmp_path / "cfg.py"
    cfg.write_text(f'''
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=18),
    neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16,
              num_outs=5),
    num_classes=5,
    test_cfg=dict(
        rpn=dict(nms_pre=32, max_per_img=8, iou_threshold=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, iou_threshold=0.5, max_per_img=4),
    ),
)
classes = ("car", "crosswalk", "light", "traffic_sign", "warning_line")
img_norm_cfg = dict(mean=[0, 0, 0], std=[255, 255, 255], to_rgb=True)
test_pipeline = [
    dict(type="LoadImageFromFile"),
    dict(type="Normalize", **img_norm_cfg),
    dict(type="Pad", size_divisor=32),
]
data = dict(test=dict(type="StreetDataset", ann_file=r"{tmp_path / 'ann.json'}",
                      img_prefix=r"{img_dir}", pipeline=test_pipeline,
                      test_mode=True))
''')
    return str(cfg), tmp_path


class TestAnalysisTools:
    def test_robustness_benchmark_runs(self, tool_fixture):
        cfg, tmp_path = tool_fixture
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools", "analysis_tools"))
        import test_robustness
        out = str(tmp_path / "robust.json")
        table, summary = test_robustness.main(
            [cfg, "--corruptions", "fog", "--severities", "0", "2",
             "--out", out])
        assert "clean" in table and "fog@2" in table
        assert "mPC" in summary
        data = json.load(open(out))
        assert "table" in data and "summary" in data

    def test_robustness_eval_summarizes(self, tmp_path):
        """robustness_eval aggregates the test_robustness JSON into
        P / mPC / rPC per metric (reference robustness_eval.py role)."""
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools", "analysis_tools"))
        import robustness_eval
        table = {
            "clean": {"bbox_mAP": 0.4, "bbox_mAP_50": 0.6},
            "fog@1": {"bbox_mAP": 0.3, "bbox_mAP_50": 0.5},
            "fog@2": {"bbox_mAP": 0.2, "bbox_mAP_50": 0.4},
            "snow@1": {"bbox_mAP": 0.1, "bbox_mAP_50": 0.3},
        }
        f = tmp_path / "r.json"
        f.write_text(json.dumps({"table": table, "summary": {}}))
        clean, per_corr, mpc = robustness_eval.main([str(f)])
        assert clean["bbox_mAP"] == 0.4
        assert per_corr["fog"]["bbox_mAP"] == pytest.approx(0.25)
        # mPC = mean over corruptions of per-corruption severity means
        assert mpc["bbox_mAP"] == pytest.approx((0.25 + 0.1) / 2)
        assert mpc["bbox_mAP_50"] == pytest.approx((0.45 + 0.3) / 2)

    def test_error_analysis_runs(self, tool_fixture):
        cfg, tmp_path = tool_fixture
        from panoswintransformerobjectdetection_tpu.data.builder import (
            build_dataset)
        from panoswintransformerobjectdetection_tpu.runtime.config import (
            load_config)
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools", "analysis_tools"))
        import coco_error_analysis
        c = load_config(cfg)
        c["data"]["test"]["classes"] = c["classes"]
        ds = build_dataset(c["data"]["test"])
        # synthetic detections: one perfect, one background FP per image
        results = []
        for _ in range(len(ds)):
            results.append({
                "boxes": np.array([[10, 10, 30, 25], [50, 40, 70, 55]],
                                  np.float32),
                "scores": np.array([0.9, 0.8], np.float32),
                "labels": np.array([0, 0])})
        table = coco_error_analysis.analyze_results(ds, results)
        assert "car" in table
        t = table["car"]
        # monotone error ladder
        assert t["C75"] <= t["C50"] <= t["Loc"] <= t["Oth"] \
            <= t["BG"] <= t["FN"] == 1.0
        # perfect match at every IoU; BG removes the FP -> AP 1
        assert t["C50"] == pytest.approx(1.0)
        assert t["BG"] == pytest.approx(1.0)


class TestTestToolTTA:
    def test_eval_tool_with_tta(self, tool_fixture):
        """`tools/test.py --tta` routes through apis/tta.aug_test_detector
        (MultiScaleFlipAug role) and produces COCOeval metrics."""
        cfg, tmp_path = tool_fixture
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "eval_tool", os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "test.py"))
        test_tool = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(test_tool)
        # patch the tta config in: small single scale to keep compile tiny
        with open(cfg, "a") as f:
            f.write('\ntta = dict(scales=((64, 96),), flip=True)\n')
        metrics = test_tool.main([cfg, "--eval", "bbox", "--tta"])
        assert "bbox_mAP" in metrics


class TestDemoScripts:
    """demo/folder_demo.py + demo/create_result_gif.py end-to-end on the
    nano config with random weights (reference demo/lzx_infer_folder.py:1,
    demo/create_result_gif.py:1 roles)."""

    def test_folder_demo_then_gif(self, tmp_path, rng):
        import subprocess
        import sys as _sys
        import cv2

        img_dir = tmp_path / "imgs"
        out_dir = tmp_path / "out"
        img_dir.mkdir()
        for i in range(2):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        (rng.random((64, 128, 3)) * 255).astype(np.uint8))
        root = os.path.join(os.path.dirname(__file__), "..")
        cfg = os.path.join(root, "configs", "panoswin",
                           "faster_rcnn_panoswin_nano_demo.py")
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   JAX_COMPILATION_CACHE_DIR=os.path.join(root, ".jax_cache"))
        # generous timeout: under a loaded full-suite run the subprocess
        # compile can take many minutes on shared CPUs
        r = subprocess.run(
            [_sys.executable, os.path.join(root, "demo", "folder_demo.py"),
             str(out_dir), str(img_dir), cfg],
            capture_output=True, text=True, env=env, timeout=2400)
        assert r.returncode == 0, r.stderr[-2000:]
        rendered = sorted(os.listdir(out_dir))
        assert rendered == ["0.jpg", "1.jpg"]

        gif = tmp_path / "result.gif"
        r = subprocess.run(
            [_sys.executable, os.path.join(root, "demo", "create_result_gif.py"),
             str(out_dir), "--out", str(gif)],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        assert gif.exists() and gif.stat().st_size > 0
