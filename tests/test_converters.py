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
