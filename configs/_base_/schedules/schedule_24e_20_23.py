# 24-epoch schedule, steps (20, 23) (reference gn+ws 20_23_24e recipes).
optimizer = dict(type="AdamW", lr=1e-4, weight_decay=0.05, betas=(0.9, 0.999))
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(20, 23))
runner = dict(type="EpochBasedRunner", max_epochs=24)
