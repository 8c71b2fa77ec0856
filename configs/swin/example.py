# example.py (reference configs/swin/example.py): the mmdet customize-
# dataset tutorial config — a cascade mask model pointed at a custom
# 5-class COCO-format dataset.
_base_ = ["cascade_mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py"]
classes = ("a", "b", "c", "d", "e")
model = dict(num_classes=5)
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(classes=classes, ann_file="path/to/your/train/annotation_data",
               img_prefix="path/to/your/train/image_data"),
    val=dict(classes=classes, ann_file="path/to/your/val/annotation_data",
             img_prefix="path/to/your/val/image_data"),
    test=dict(classes=classes, ann_file="path/to/your/test/annotation_data",
              img_prefix="path/to/your/test/image_data"),
)
