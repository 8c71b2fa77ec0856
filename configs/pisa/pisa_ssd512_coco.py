# pisa_ssd512_coco (reference configs/pisa/).
_base_ = ["../ssd/ssd512_coco.py"]
model = dict(pisa=dict(isr_k=2.0, isr_bias=0.0, carl_k=1.0, carl_bias=0.2))
