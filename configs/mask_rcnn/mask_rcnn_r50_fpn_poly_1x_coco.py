# mask_rcnn_r50_fpn_poly_1x_coco (reference configs/mask_rcnn/).
_base_ = ["mask_rcnn_r50_fpn_1x_coco.py"]
# polygon-decoded masks (loader default); reference-name parity
