# Faster R-CNN on Cityscapes (reference configs/cityscapes/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(num_classes=8)
dataset_type = "CityscapesDataset"
data_root = "data/cityscapes/"
data = dict(
    train=dict(type=dataset_type,
               ann_file=data_root + "annotations/instancesonly_filtered_gtFine_train.json",
               img_prefix=data_root + "leftImg8bit/train/"),
    val=dict(type=dataset_type,
             ann_file=data_root + "annotations/instancesonly_filtered_gtFine_val.json",
             img_prefix=data_root + "leftImg8bit/val/", test_mode=True),
    test=dict(type=dataset_type,
              ann_file=data_root + "annotations/instancesonly_filtered_gtFine_val.json",
              img_prefix=data_root + "leftImg8bit/val/", test_mode=True),
)
