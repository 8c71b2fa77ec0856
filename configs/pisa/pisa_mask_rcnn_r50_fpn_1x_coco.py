# PISA Mask R-CNN (reference configs/pisa/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(
    pisa=dict(isr_k=2.0, isr_bias=0.0, carl_k=1.0, carl_bias=0.2),
    # ScoreHLRSampler (ISR-N): hard-negative selection + score-rank
    # label weights (reference pisa configs sampler type=ScoreHLRSampler)
    train_cfg=dict(rcnn=dict(sampler=dict(
        type="score_hlr", k=0.5, bias=0.0, score_thr=0.05, iou_thr=0.5))))
