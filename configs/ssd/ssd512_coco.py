# ssd512_coco (reference configs/ssd/).
_base_ = ["ssd300_coco.py"]
model = dict(input_size=512)
