# sparse_rcnn_r101_fpn_300_proposals_crop_mstrain_480-800_3x_coco (reference configs/sparse_rcnn/).
_base_ = ["sparse_rcnn_r101_fpn_mstrain_480-800_3x_coco.py"]
model = dict(num_proposals=300)
