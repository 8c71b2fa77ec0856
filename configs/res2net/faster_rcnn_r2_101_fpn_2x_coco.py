# Res2Net-101 Faster R-CNN (reference configs/res2net/).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    backbone=dict(_delete_=True, type="Res2Net", depth=101,
                  out_indices=(0, 1, 2, 3)),
)
