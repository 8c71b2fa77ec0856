# pisa_retinanet_r50_fpn_1x_coco (reference configs/pisa/):
# ISR-P + CARL on the retina head losses.
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]
model = dict(pisa=dict(isr_k=2.0, isr_bias=0.0, carl_k=1.0, carl_bias=0.2))
