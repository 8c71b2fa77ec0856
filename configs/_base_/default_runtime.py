# Runtime defaults — reference configs/_base_/default_runtime.py.
checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
workflow = [("train", 1)]
seed = 0
