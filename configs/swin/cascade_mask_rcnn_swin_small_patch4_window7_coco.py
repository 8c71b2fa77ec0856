# Swin-S Cascade Mask R-CNN COCO
# (reference configs/swin/cascade_mask_rcnn_swin_small_*.py, bf16 in place
# of the reference's apex fp16 — EpochBasedRunnerAmp + use_fp16 role).
_base_ = ["faster_rcnn_swin_tiny_patch4_window7_coco.py"]

model = dict(
    type="CascadeMaskRCNN",
    with_mask=True,
    backbone=dict(depths=(2, 2, 18, 2), drop_path_rate=0.2),
    compute_dtype="bfloat16",
)
