"""Dataset/model converter tools on synthetic fixtures
(reference `tools/dataset_converters/`, `tools/model_converters/`)."""

import json
import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.join(TOOLS, "dataset_converters"))
sys.path.insert(0, os.path.join(TOOLS, "model_converters"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestVOCConverter:
    def test_roundtrip_through_dataset(self, tmp_path):
        import pascal_voc
        dev = tmp_path / "VOCdevkit"
        (dev / "VOC2007" / "Annotations").mkdir(parents=True)
        (dev / "VOC2007" / "ImageSets" / "Main").mkdir(parents=True)
        xml = """<annotation><size><width>100</width><height>80</height>
        <depth>3</depth></size>
        <object><name>car</name><difficult>0</difficult>
        <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>40</ymax>
        </bndbox></object>
        <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>60</xmin><ymin>20</ymin><xmax>90</xmax><ymax>70</ymax>
        </bndbox></object></annotation>"""
        (dev / "VOC2007" / "Annotations" / "000001.xml").write_text(xml)
        (dev / "VOC2007" / "ImageSets" / "Main" / "trainval.txt").write_text(
            "000001\n")
        out = str(tmp_path / "voc.json")
        coco = pascal_voc.convert(str(dev),
                                  "VOC2007/ImageSets/Main/trainval.txt", out)
        assert len(coco["images"]) == 1
        assert len(coco["annotations"]) == 2
        assert coco["annotations"][0]["bbox"] == [10, 10, 40, 30]
        assert coco["annotations"][1]["ignore"] == 1  # difficult
        # the produced json loads through CocoStyleDataset
        from panoswintransformerobjectdetection_tpu.data.datasets import (
            CocoStyleDataset)
        ds = CocoStyleDataset(out, test_mode=True,
                              classes=("car", "person"))
        assert len(ds) == 1


class TestCityscapesConverter:
    def test_polygons_to_coco(self, tmp_path):
        import cityscapes
        d = tmp_path / "gtFine" / "val" / "city1"
        d.mkdir(parents=True)
        polys = {"imgWidth": 200, "imgHeight": 100, "objects": [
            {"label": "car", "polygon": [[10, 10], [10, 40], [60, 40],
                                         [60, 10]]},
            {"label": "persongroup", "polygon": [[80, 20], [80, 60],
                                                 [120, 60], [120, 20]]},
            {"label": "sky", "polygon": [[0, 0], [0, 5], [5, 5]]},
        ]}
        (d / "city1_000000_gtFine_polygons.json").write_text(json.dumps(polys))
        out = str(tmp_path / "cs.json")
        coco = cityscapes.convert(str(tmp_path), "val", out)
        assert len(coco["images"]) == 1
        anns = coco["annotations"]
        assert len(anns) == 2  # sky dropped
        assert anns[0]["bbox"] == [10, 10, 50, 30]
        assert anns[1]["iscrowd"] == 1  # persongroup -> crowd person
        names = {c["id"]: c["name"] for c in coco["categories"]}
        assert names[anns[1]["category_id"]] == "person"


class TestIndoor360Converter:
    def test_reindex(self, tmp_path):
        import indoor360
        raw = {"images": [{"id": 77, "filename": "a.jpg",
                           "width": 1024, "height": 512}],
               "annotations": [{"id": 900, "image_id": 77, "category_id": 12,
                                "bbox": [0.5, 1.0, 0.4, 0.3]}],
               "categories": [{"id": 12, "name": "chair"}]}
        src = tmp_path / "raw.json"
        src.write_text(json.dumps(raw))
        out = str(tmp_path / "out.json")
        coco = indoor360.convert(str(src), out)
        assert coco["images"][0]["id"] == 0
        assert coco["images"][0]["file_name"] == "a.jpg"
        assert coco["annotations"][0]["image_id"] == 0
        assert coco["annotations"][0]["category_id"] == 1
        assert coco["categories"][0] == {"id": 1, "name": "chair"}


class TestUpgradeModelVersion:
    def test_key_renames(self):
        import upgrade_model_version as u
        sd = {"module.backbone.x": 1, "bbox_head.fc.weight": 2,
              "neck.conv": 3}
        out = u.upgrade(sd)
        assert out == {"backbone.x": 1, "roi_head.bbox_head.fc.weight": 2,
                       "neck.conv": 3}


class TestResNetConverter:
    @staticmethod
    def _torch_resnet18():
        """Minimal torch ResNet-18 with torchvision state_dict naming
        (torchvision itself is not installed in this image)."""
        import torch.nn as tnn

        class Block(tnn.Module):
            def __init__(self, cin, planes, stride=1):
                super().__init__()
                self.conv1 = tnn.Conv2d(cin, planes, 3, stride, 1,
                                        bias=False)
                self.bn1 = tnn.BatchNorm2d(planes)
                self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(planes)
                self.relu = tnn.ReLU()
                self.downsample = None
                if stride != 1 or cin != planes:
                    self.downsample = tnn.Sequential(
                        tnn.Conv2d(cin, planes, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes))

            def forward(self, x):
                idt = x if self.downsample is None else self.downsample(x)
                y = self.relu(self.bn1(self.conv1(x)))
                return self.relu(self.bn2(self.conv2(y)) + idt)

        class R18(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                self.relu = tnn.ReLU()
                self.maxpool = tnn.MaxPool2d(3, 2, 1)
                for i, (planes, stride) in enumerate(
                        [(64, 1), (128, 2), (256, 2), (512, 2)]):
                    cin = 64 if i == 0 else planes // 2
                    setattr(self, f"layer{i + 1}", tnn.Sequential(
                        Block(cin, planes, stride), Block(planes, planes)))

        m = R18()
        # randomize BN stats so parity actually exercises them
        import torch
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * .1)
                mod.running_var.copy_(
                    torch.rand_like(mod.running_var) * .5 + .75)
                mod.weight.data.copy_(torch.randn_like(mod.weight) * .1 + 1)
                mod.bias.data.copy_(torch.randn_like(mod.bias) * .1)
        return m

    def test_torchvision_resnet18_parity(self):
        """Converted torchvision-style weights reproduce the torch forward
        (`torchvision://resnet18` source, `mmcv_custom/checkpoint.py:240`)."""
        torch = pytest.importorskip("torch")
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            convert_resnet_backbone)
        from panoswintransformerobjectdetection_tpu.models.resnet import ResNet

        with torch.no_grad():
            tm = self._torch_resnet18()
        tm.eval()
        x = np.random.RandomState(0).random((1, 3, 64, 64)).astype(np.float32)
        feats = {}
        with torch.no_grad():
            h = tm.conv1(torch.from_numpy(x))
            h = tm.maxpool(tm.relu(tm.bn1(h)))
            for i in range(1, 5):
                h = getattr(tm, f"layer{i}")(h)
                feats[i - 1] = h.numpy()

        params, stats = convert_resnet_backbone(tm.state_dict(), 18)
        bb = ResNet(depth=18)
        outs = bb.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
        for i, o in enumerate(outs):
            got = np.asarray(o).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, feats[i], atol=2e-4,
                                       err_msg=f"stage {i}")

    def test_detectron_blobs_convert_and_apply(self):
        """detectron2jax blob mapping produces an applyable R-50 tree."""
        import detectron2jax
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            convert_resnet_backbone)
        from panoswintransformerobjectdetection_tpu.models.resnet import ResNet

        rs = np.random.RandomState(1)
        blobs = {"conv1_w": rs.randn(64, 3, 7, 7).astype(np.float32),
                 "res_conv1_bn_s": np.ones(64, np.float32),
                 "res_conv1_bn_b": np.zeros(64, np.float32)}
        blocks = (3, 4, 6, 3)
        cin = 64
        for i, nb in enumerate(blocks):
            planes, cout = 64 * 2 ** i, 256 * 2 ** i
            for j in range(nb):
                nm = f"res{i + 2}_{j}"
                if j == 0:
                    blobs[f"{nm}_branch1_w"] = rs.randn(
                        cout, cin, 1, 1).astype(np.float32)
                    blobs[f"{nm}_branch1_bn_s"] = np.ones(cout, np.float32)
                    blobs[f"{nm}_branch1_bn_b"] = np.zeros(cout, np.float32)
                shapes = {"branch2a": (planes, cin if j == 0 else cout, 1),
                          "branch2b": (planes, planes, 3),
                          "branch2c": (cout, planes, 1)}
                for sub, (o, c, k) in shapes.items():
                    blobs[f"{nm}_{sub}_w"] = rs.randn(
                        o, c, k, k).astype(np.float32) * 0.01
                    blobs[f"{nm}_{sub}_bn_s"] = np.ones(o, np.float32)
                    blobs[f"{nm}_{sub}_bn_b"] = np.zeros(o, np.float32)
            cin = cout
        sd = detectron2jax.detectron_to_torch_names(blobs, 50)
        params, stats = convert_resnet_backbone(sd, 50)
        bb = ResNet(depth=50)
        outs = bb.apply({"params": params, "batch_stats": stats},
                        jnp.zeros((1, 32, 32, 3)))
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


class TestRegNetConverter:
    def test_pycls_names_convert_and_apply(self):
        import jax.numpy as jnp
        from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
            convert_regnet_backbone)
        from panoswintransformerobjectdetection_tpu.models.backbones_extra import (
            RegNet, REGNET_ARCH)

        arch = "regnetx_3.2gf"
        cfg = REGNET_ARCH[arch]
        rs = np.random.RandomState(2)
        sd = {"stem.conv.weight": rs.randn(32, 3, 3, 3).astype(np.float32)}
        for n in ("weight", "bias", "running_mean", "running_var"):
            sd[f"stem.bn.{n}"] = (np.ones(32, np.float32) if "var" in n
                                  or n == "weight" else
                                  np.zeros(32, np.float32))
        cin = 32
        for i, (w, d) in enumerate(zip(cfg["widths"], cfg["depths"])):
            for j in range(d):
                nm = f"s{i + 1}.b{j + 1}"
                if j == 0:
                    sd[f"{nm}.proj.weight"] = rs.randn(
                        w, cin, 1, 1).astype(np.float32)
                    for n in ("weight", "bias", "running_mean",
                              "running_var"):
                        sd[f"{nm}.bn.{n}"] = (
                            np.ones(w, np.float32)
                            if "var" in n or n == "weight"
                            else np.zeros(w, np.float32))
                g = cfg["groups"]
                shapes = {"a": (w, cin if j == 0 else w, 1),
                          "b": (w, w // (w // g), 3), "c": (w, w, 1)}
                for sub, (o, c, k) in shapes.items():
                    sd[f"{nm}.f.{sub}.weight"] = rs.randn(
                        o, c, k, k).astype(np.float32) * 0.01
                    for n in ("weight", "bias", "running_mean",
                              "running_var"):
                        sd[f"{nm}.f.{sub}_bn.{n}"] = (
                            np.ones(o, np.float32)
                            if "var" in n or n == "weight"
                            else np.zeros(o, np.float32))
            cin = w
        params, stats = convert_regnet_backbone(sd, arch)
        bb = RegNet(arch=arch)
        outs = bb.apply({"params": params, "batch_stats": stats},
                        jnp.zeros((1, 32, 32, 3)))
        assert [o.shape[-1] for o in outs] == list(cfg["widths"])
