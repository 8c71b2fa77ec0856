# fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x_coco
# (reference configs/fcos/): center sampling + normalized bbox targets
# + centerness on the reg tower + GIoU loss.
_base_ = ["fcos_center_r50_caffe_fpn_gn-head_1x_coco.py"]
model = dict(norm_on_bbox=True, centerness_on_reg=True,
             use_giou=True)
