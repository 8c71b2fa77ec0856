# yolov3_d53_mstrain-416_273e_coco (reference configs/yolo/).
_base_ = ["yolov3_d53_coco.py"]
# 416-scale training variant.
data = dict(samples_per_gpu=8)
