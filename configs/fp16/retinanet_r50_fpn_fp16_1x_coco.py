# retinanet mixed precision (reference configs/fp16/; bf16 is the TPU analogue
# of fp16 — no loss scaling needed).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(compute_dtype="bfloat16")
fp16 = dict(loss_scale=512.0)  # recorded for parity; unused on TPU
