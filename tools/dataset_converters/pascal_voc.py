#!/usr/bin/env python
"""Pascal VOC XML -> COCO-json converter (reference
`tools/dataset_converters/pascal_voc.py`).

    python tools/dataset_converters/pascal_voc.py <VOCdevkit> --split VOC2007/ImageSets/Main/trainval.txt --out voc_trainval.json
"""

import argparse
import json
import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from panoswintransformerobjectdetection_tpu.data.datasets import VOC_CLASSES


def convert(devkit: str, split: str, out: str):
    name_to_id = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    images, annotations = [], []
    aid = 1
    year_dir = os.path.dirname(os.path.dirname(os.path.dirname(split)))
    with open(os.path.join(devkit, split)) as f:
        ids = [l.strip() for l in f if l.strip()]
    for img_id, stem in enumerate(ids):
        xml_path = os.path.join(devkit, year_dir, "Annotations", stem + ".xml")
        root = ET.parse(xml_path).getroot()
        size = root.find("size")
        w, h = int(size.find("width").text), int(size.find("height").text)
        images.append({"id": img_id, "width": w, "height": h,
                       "file_name": os.path.join(year_dir, "JPEGImages",
                                                 stem + ".jpg")})
        for obj in root.findall("object"):
            name = obj.find("name").text
            if name not in name_to_id:
                continue
            bb = obj.find("bndbox")
            x1, y1, x2, y2 = (float(bb.find(t).text) for t in
                              ("xmin", "ymin", "xmax", "ymax"))
            difficult = obj.find("difficult")
            annotations.append({
                "id": aid, "image_id": img_id,
                "category_id": name_to_id[name],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1),
                "iscrowd": 0,
                "ignore": int(difficult.text) if difficult is not None else 0,
            })
            aid += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": i, "name": c}
                           for c, i in name_to_id.items()]}
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {out}: {len(images)} images, {len(annotations)} anns")
    return coco


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("devkit")
    p.add_argument("--split", default="VOC2007/ImageSets/Main/trainval.txt")
    p.add_argument("--out", default="voc_coco.json")
    a = p.parse_args()
    convert(a.devkit, a.split, a.out)
