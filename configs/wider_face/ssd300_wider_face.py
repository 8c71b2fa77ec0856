# SSD-300 on WIDER Face (reference configs/wider_face/).
_base_ = ["../ssd/ssd300_coco.py"]
model = dict(num_classes=1)
dataset_type = "WIDERFaceDataset"
data_root = "data/WIDERFace/"
data = dict(
    train=dict(type=dataset_type, ann_file=data_root + "train.json",
               img_prefix=data_root + "WIDER_train/"),
    val=dict(type=dataset_type, ann_file=data_root + "val.json",
             img_prefix=data_root + "WIDER_val/", test_mode=True),
    test=dict(type=dataset_type, ann_file=data_root + "val.json",
              img_prefix=data_root + "WIDER_val/", test_mode=True),
)
