#!/usr/bin/env python
"""Convert detectron caffe2 ResNet weights to this framework's flax tree
(reference `tools/model_converters/detectron2pytorch.py`): detectron stores
`conv_w` blobs plus affine-channel `bn_s`/`bn_b` pairs; we materialize them
as BatchNorm scale/bias with zero mean / unit var, then reuse the torch
naming -> flax converter."""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

ARCH_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _load_blobs(src):
    with open(src, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    return data.get("blobs", data)


def detectron_to_torch_names(blobs, depth):
    """caffe2 blob names -> torchvision-style state_dict (numpy values)."""
    sd = {}

    def conv(caffe, torch_name):
        sd[torch_name + ".weight"] = np.asarray(blobs[caffe + "_w"])
        if caffe + "_b" in blobs:
            sd[torch_name + ".bias"] = np.asarray(blobs[caffe + "_b"])

    def bn(caffe, torch_name):
        s = np.asarray(blobs[caffe + "_s"])
        sd[torch_name + ".weight"] = s
        sd[torch_name + ".bias"] = np.asarray(blobs[caffe + "_b"])
        sd[torch_name + ".running_mean"] = np.zeros_like(s)
        sd[torch_name + ".running_var"] = np.ones_like(s)

    conv("conv1", "conv1")
    bn("res_conv1_bn", "bn1")
    blocks = ARCH_BLOCKS[depth]
    for i, nb in enumerate(blocks):
        for j in range(nb):
            name = f"res{i + 2}_{j}"
            tname = f"layer{i + 1}.{j}"
            if j == 0:
                conv(f"{name}_branch1", f"{tname}.downsample.0")
                bn(f"{name}_branch1_bn", f"{tname}.downsample.1")
            for caffe_sub, torch_sub in (("branch2a", "conv1"),
                                         ("branch2b", "conv2"),
                                         ("branch2c", "conv3")):
                conv(f"{name}_{caffe_sub}", f"{tname}.{torch_sub}")
                bn(f"{name}_{caffe_sub}_bn",
                   f"{tname}.bn{torch_sub[-1]}")
    return sd


def main():
    p = argparse.ArgumentParser(description="detectron -> flax ResNet")
    p.add_argument("src", help="detectron .pkl weight file")
    p.add_argument("dst", help="output orbax checkpoint dir")
    p.add_argument("depth", type=int, choices=(50, 101))
    args = p.parse_args()

    from panoswintransformerobjectdetection_tpu.runtime.checkpoint import (
        convert_resnet_backbone)
    import orbax.checkpoint as ocp

    blobs = _load_blobs(args.src)
    sd = detectron_to_torch_names(blobs, args.depth)
    params, stats = convert_resnet_backbone(sd, args.depth)
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(args.dst),
        {"params": params, "batch_stats": stats}, force=True)
    print(f"converted {len(sd)} tensors -> {args.dst}")


if __name__ == "__main__":
    main()
