# sabl_retinanet_r50_fpn_gn_1x_coco (reference configs/sabl/).
_base_ = ["sabl_retinanet_r50_fpn_1x_coco.py"]
# GN-head variant (head norm baked into SABLRetinaHead)
