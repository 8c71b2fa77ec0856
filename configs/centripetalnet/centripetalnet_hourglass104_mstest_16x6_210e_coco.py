# CentripetalNet Hourglass (reference configs/centripetalnet/).
_base_ = ["../cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py"]
model = dict(type="CentripetalNet")
