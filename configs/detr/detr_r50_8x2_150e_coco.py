# detr_r50_8x2_150e_coco (reference configs/detr/): the 150-epoch
# AdamW recipe with the multi-scale + random-crop AutoAugment policy.
_base_ = ["detr_r50_coco.py"]
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=1e-4)
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(100,))
runner = dict(type="EpochBasedRunner", max_epochs=150)
