# 3x (36 epoch) mstrain schedule — the swin recipes' schedule
# (reference configs/swin/*_mstrain_480-800_adamw_3x_coco.py).
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05, betas=(0.9, 0.999))
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(27, 33))
runner = dict(type="EpochBasedRunner", max_epochs=36)
