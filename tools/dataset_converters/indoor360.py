#!/usr/bin/env python
"""360-Indoor annotation re-indexer (reference `lzx/indoor360/convert2coco.py`
+ `data_write.py id_update`): normalizes the released 360-Indoor json into
contiguous ids / COCO field names so `Indoor360Dataset` can read it.  BFoV
bboxes are kept in (u, v, w, h) radians — the dataset converts to equirect
xyxy at parse time.

    python tools/dataset_converters/indoor360.py raw.json --out train.json
"""

import argparse
import json


def convert(src: str, out: str):
    with open(src) as f:
        data = json.load(f)
    cats = sorted(data["categories"], key=lambda c: c["id"])
    cat_remap = {c["id"]: i + 1 for i, c in enumerate(cats)}
    img_remap = {im["id"]: i for i, im in enumerate(data["images"])}
    images = []
    for im in data["images"]:
        images.append({"id": img_remap[im["id"]],
                       "file_name": im.get("file_name", im.get("filename")),
                       "width": im["width"], "height": im["height"]})
    annotations = []
    for i, a in enumerate(data.get("annotations", [])):
        if a["image_id"] not in img_remap:
            continue
        annotations.append({
            "id": i + 1,
            "image_id": img_remap[a["image_id"]],
            "category_id": cat_remap[a["category_id"]],
            "bbox": list(a["bbox"]),
            "area": a.get("area", 0.0),
            "iscrowd": a.get("iscrowd", 0)})
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": cat_remap[c["id"]], "name": c["name"]}
                           for c in cats]}
    with open(out, "w") as f:
        json.dump(coco, f)
    print(f"wrote {out}: {len(images)} images, {len(annotations)} anns")
    return coco


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("--out", default="indoor360_coco.json")
    a = p.parse_args()
    convert(a.src, a.out)
