# Faster R-CNN R-50 on VOC (reference configs/pascal_voc/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py",
          "../_base_/datasets/voc0712.py"]
model = dict(num_classes=20)
