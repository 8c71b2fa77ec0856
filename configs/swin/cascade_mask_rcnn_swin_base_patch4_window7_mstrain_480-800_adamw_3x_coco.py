# Swin-B Cascade Mask R-CNN 3x mstrain fp16->bf16 (BASELINE config 5;
# reference configs/swin/cascade_mask_rcnn_swin_base_*.py).
_base_ = ["cascade_mask_rcnn_swin_small_patch4_window7_mstrain_480-800_adamw_3x_coco.py"]
model = dict(
    backbone=dict(embed_dim=128, depths=(2, 2, 18, 2),
                  num_heads=(4, 8, 16, 32), drop_path_rate=0.3),
    neck=dict(in_channels=(128, 256, 512, 1024)),
)
