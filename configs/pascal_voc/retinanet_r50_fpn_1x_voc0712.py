# RetinaNet R-50 on VOC (reference configs/pascal_voc/).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py",
          "../_base_/datasets/voc0712.py"]
model = dict(num_classes=20)
