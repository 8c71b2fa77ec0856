# htc_hrnetv2p_w40_28e_coco (reference configs/hrnet/).
_base_ = ["htc_hrnetv2p_w40_20e_coco.py"]
lr_config = dict(warmup_iters=500, warmup_ratio=0.001, step=(24, 27))
runner = dict(type="EpochBasedRunner", max_epochs=28)
