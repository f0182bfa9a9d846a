"""VGG16 convolutional backbone (Faster R-CNN parity).

≙ `FasterRCNN/building_blocks/vgg.py:10-96`: conv1_1..conv5_3 with 4 max
pools, producing a stride-16 feature map ([B, 14, 14, 512] from 224²). The
classifier FC layers are omitted just like the reference — only the feature
map is needed for RPN + Fast R-CNN.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

VGG16_LAYOUT = (
    ("conv1", (64, 64)),
    ("conv2", (128, 128)),
    ("conv3", (256, 256, 256)),
    ("conv4", (512, 512, 512)),
    ("conv5", (512, 512, 512)),
)


class VGG16(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:
        x = images.astype(self.dtype)
        for bi, (block, widths) in enumerate(VGG16_LAYOUT):
            for ci, width in enumerate(widths):
                x = nn.Conv(
                    width, (3, 3), padding="SAME",
                    name=f"{block}_{ci + 1}",
                    dtype=self.dtype, param_dtype=jnp.float32,
                )(x)
                x = nn.relu(x)
            if bi < 4:  # no pool after conv5 (vgg.py:92-95)
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        return x


def load_vgg_imagenet_npy(npy_path: str, variables):
    """Fill VGG16 params from the reference's `VGG_imagenet.npy` layout.

    ≙ vgg.init_weights/init_bias (vgg.py:28-55): a pickled dict keyed
    ``conv1_1_W`` / ``conv1_1_b`` with HWIO kernels.
    """
    import numpy as np
    import jax

    weights = np.load(npy_path, encoding="latin1", allow_pickle=True).item()
    params = dict(variables["params"])
    new = {}
    for name, leafs in params.items():
        kernel = weights.get(f"{name}_W")
        bias = weights.get(f"{name}_b")
        if kernel is None:
            new[name] = leafs
            continue
        new[name] = {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(bias),
        }
    return {**variables, "params": new}
