# Reference configs/_base_/datasets/lvis_v1_instance.py — 1230-class
# federated LVIS with class-balanced oversampling.
_base_ = ["coco_instance.py"]
dataset_type = "LVISDataset"
data_root = "data/lvis_v1/"
data = dict(
    train=dict(_delete_=True, type="ClassBalancedDataset", oversample_thr=1e-3,
               dataset=dict(type=dataset_type,
                            ann_file=data_root + "annotations/lvis_v1_train.json",
                            img_prefix=data_root + "train2017/")),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/lvis_v1_val.json",
             img_prefix=data_root + "val2017/", test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/lvis_v1_val.json",
              img_prefix=data_root + "val2017/", test_mode=True),
)
