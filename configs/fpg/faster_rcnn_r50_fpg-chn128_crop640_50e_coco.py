# faster_rcnn_r50_fpg-chn128_crop640_50e_coco (reference configs/fpg/).
_base_ = ["faster_rcnn_r50_fpg_crop640_50e_coco.py"]
model = dict(neck=dict(out_channels=128))
