# yolact_r50_8x8_coco (reference configs/yolact/).
_base_ = ["yolact_r50_1x8_coco.py"]
data = dict(samples_per_gpu=8)
optimizer = dict(lr=8e-4)
