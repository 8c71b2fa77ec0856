# Training from scratch, 6x schedule (reference configs/scratch/):
# no pretrained backbone, long schedule.
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(65, 71))
runner = dict(max_epochs=73)
