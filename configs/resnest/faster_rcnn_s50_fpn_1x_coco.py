# ResNeSt-50 Faster R-CNN (reference configs/resnest/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="ResNeSt", depth=50,
                  out_indices=(0, 1, 2, 3)),
)
