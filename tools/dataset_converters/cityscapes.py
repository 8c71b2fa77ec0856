#!/usr/bin/env python
"""Cityscapes gtFine polygons -> COCO-json instances (reference
`tools/dataset_converters/cityscapes.py`, without the cityscapesscripts
dependency: reads the plain `*_gtFine_polygons.json` files directly).

    python tools/dataset_converters/cityscapes.py <cityscapes_root> --split val --out cityscapes_val.json
"""

import argparse
import glob
import json
import os

CLASSES = ("person", "rider", "car", "truck", "bus", "train",
           "motorcycle", "bicycle")


def convert(root: str, split: str, out: str):
    name_to_id = {c: i + 1 for i, c in enumerate(CLASSES)}
    images, annotations = [], []
    aid = 1
    pattern = os.path.join(root, "gtFine", split, "*", "*_gtFine_polygons.json")
    for img_id, path in enumerate(sorted(glob.glob(pattern))):
        with open(path) as f:
            data = json.load(f)
        city = os.path.basename(os.path.dirname(path))
        stem = os.path.basename(path).replace("_gtFine_polygons.json", "")
        images.append({
            "id": img_id, "width": data["imgWidth"],
            "height": data["imgHeight"],
            "file_name": os.path.join("leftImg8bit", split, city,
                                      stem + "_leftImg8bit.png")})
        for obj in data.get("objects", []):
            label = obj["label"]
            crowd = 0
            if label.endswith("group"):  # e.g. 'persongroup' -> crowd person
                label = label[:-len("group")]
                crowd = 1
            if label not in name_to_id:
                continue
            xs = [p[0] for p in obj["polygon"]]
            ys = [p[1] for p in obj["polygon"]]
            x1, y1, x2, y2 = min(xs), min(ys), max(xs), max(ys)
            poly = [float(v) for xy in obj["polygon"] for v in xy]
            annotations.append({
                "id": aid, "image_id": img_id,
                "category_id": name_to_id[label],
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "area": (x2 - x1) * (y2 - y1),
                "segmentation": [poly],
                "iscrowd": crowd})
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
    p.add_argument("root")
    p.add_argument("--split", default="val")
    p.add_argument("--out", default="cityscapes_coco.json")
    a = p.parse_args()
    convert(a.root, a.split, a.out)
