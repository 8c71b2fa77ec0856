# 2x (24 epoch) schedule — reference configs/_base_/schedules/schedule_2x.py.
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05, betas=(0.9, 0.999))
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(16, 22))
runner = dict(type="EpochBasedRunner", max_epochs=24)
