# htc_r50_rfp_1x_coco (reference configs/detectors/).
_base_ = ["detectors_htc_r50_1x_coco.py"]
# RFP-only ablation (no SAC)
