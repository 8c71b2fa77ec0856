# NAS-FCOS (reference configs/nas_fcos/).
_base_ = ["../fcos/fcos_r50_fpn_1x_coco.py"]
model = dict(type="NASFCOS")
