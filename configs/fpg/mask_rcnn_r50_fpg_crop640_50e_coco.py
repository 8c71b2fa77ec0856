# Mask R-CNN with Feature Pyramid Grids (reference configs/fpg/).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]
model = dict(neck=dict(_delete_=True, type="FPG",
                       in_channels=(256, 512, 1024, 2048),
                       out_channels=256, num_outs=5, stack_times=9))
runner = dict(max_epochs=50)
