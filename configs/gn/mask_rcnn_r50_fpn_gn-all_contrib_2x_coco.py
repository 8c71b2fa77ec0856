# mask_rcnn_r50_fpn_gn-all_contrib_2x_coco (reference configs/gn/).
_base_ = ["mask_rcnn_r50_fpn_gn-all_2x_coco.py"]
# contrib GN weights variant — identical graph, different pretrained init
