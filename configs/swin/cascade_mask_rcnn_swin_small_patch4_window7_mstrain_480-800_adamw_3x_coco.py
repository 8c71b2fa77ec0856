# Swin-S Cascade Mask R-CNN 3x mstrain fp16->bf16 (BASELINE config 5;
# reference configs/swin/cascade_mask_rcnn_swin_small_patch4_window7_
# mstrain_480-800_adamw_3x_coco.py:129-139 EpochBasedRunnerAmp+use_fp16).
_base_ = ["cascade_mask_rcnn_swin_tiny_patch4_window7_mstrain_480-800_adamw_1x_coco.py",
          "../_base_/schedules/schedule_3x.py"]
model = dict(backbone=dict(depths=(2, 2, 18, 2), drop_path_rate=0.2))
