# Mask R-CNN on LVIS v1 with class-balanced resampling (reference configs/lvis/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(num_classes=1203)
dataset_type = "LVISDataset"
data_root = "data/lvis_v1/"
data = dict(
    train=dict(type="ClassBalancedDataset", oversample_thr=1e-3,
               dataset=dict(type=dataset_type,
                            ann_file=data_root + "annotations/lvis_v1_train.json",
                            img_prefix=data_root)),
    val=dict(type=dataset_type, ann_file=data_root + "annotations/lvis_v1_val.json",
             img_prefix=data_root, test_mode=True),
    test=dict(type=dataset_type, ann_file=data_root + "annotations/lvis_v1_val.json",
              img_prefix=data_root, test_mode=True),
)
