# bf16 compute variant (apex-AMP O1 role on TPU).
_base_ = ["faster_rcnn_panoswin_tiny_patch4_window7_streetwin.py"]
model = dict(compute_dtype="bfloat16")
