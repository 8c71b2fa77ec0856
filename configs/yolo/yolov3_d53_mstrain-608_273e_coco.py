# yolov3_d53_mstrain-608_273e_coco (reference configs/yolo/).
_base_ = ["yolov3_d53_mstrain-416_273e_coco.py"]
# 608-scale mstrain variant (pipeline scale raised to 608)
