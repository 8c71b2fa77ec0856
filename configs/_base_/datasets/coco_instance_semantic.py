# Reference configs/_base_/datasets/coco_instance_semantic.py — instance
# masks + stuff semantic maps (the HTC recipe's data).
_base_ = ["coco_instance.py"]
data_root = "data/coco/"
data = dict(
    train=dict(seg_prefix=data_root + "stuffthingmaps/train2017/"),
)
