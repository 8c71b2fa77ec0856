"""PanoSwin classification head (OmniMNIST workload).

Reference `lzx/omni_mnist/train_classification.py:32-72`: tiny PanoSwin
backbone -> global average pool of the last stage -> Linear(num_classes).
"""

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .registry import BACKBONES, DETECTORS, build
from .layers import trunc_init


@DETECTORS.register
class PanoSwinClassifier(nn.Module):
    backbone: Any
    num_classes: int = 10

    def setup(self):
        self.backbone_m = build(BACKBONES, self.backbone)
        self.fc = nn.Dense(self.num_classes, kernel_init=trunc_init, name="fc")

    def __call__(self, images, train: bool = False):
        feats = self.backbone_m(images, train=train)
        x = feats[-1].mean(axis=(1, 2))
        return self.fc(x)
