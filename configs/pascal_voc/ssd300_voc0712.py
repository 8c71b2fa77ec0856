# ssd300_voc0712 (reference configs/pascal_voc/).
_base_ = ["../ssd/ssd300_coco.py", "../_base_/datasets/voc0712.py"]
model = dict(num_classes=20)
