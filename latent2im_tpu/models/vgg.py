"""VGG16/VGG19 feature towers for perceptual losses, TPU-native JAX (NHWC).

The reference uses torchvision vgg19.features for the walk-training content
loss, tapping conv_1..conv_4 with ImageNet normalization prepended (reference:
graphs/stylegan_v2_real/transform_base.py:426-454), and a vgg16 slice at
relu1_2/relu2_2/relu3_3/relu4_3 for the BP.py gram-matrix inversion loss
(perceptual_vgg/vgg.py:5-37). This module implements both as one tap-emitting
forward over the standard VGG configs, torchvision weight-layout compatible.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

CFGS = {
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
              512, "M", 512, 512, 512, 512, "M"],
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# BP.py's vgg16 gram taps (perceptual_vgg/vgg.py:14-21)
VGG16_GRAM_TAPS = ("relu_2", "relu_4", "relu_7", "relu_10")
# walk-training content-loss taps (transform_base.py:427)
CONTENT_TAPS = ("conv_1", "conv_2", "conv_3", "conv_4")


def imagenet_normalize(img):
    """(img - mean) / std.

    NOTE: the reference applies this to generator output that lives in
    [-1, 1] without first rescaling to [0, 1] (transform_base.py:44-54,
    426-454); we reproduce that behavior exactly at the loss call sites.
    """
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def init_vgg(key, cfg_name: str = "vgg19") -> Params:
    cfg = CFGS[cfg_name]
    keys = jax.random.split(key, len(cfg))
    layers = []
    cin = 3
    for i, v in enumerate(cfg):
        if v == "M":
            continue
        fan_in = cin * 9
        bound = 1.0 / math.sqrt(fan_in)
        layers.append(
            {
                "w": jax.random.uniform(
                    keys[i], (3, 3, cin, v), jnp.float32, -bound, bound
                ),
                "b": jnp.zeros((v,), jnp.float32),
            }
        )
        cin = v
    return {"cfg": cfg_name, "convs": layers}


def vgg_features(
    params: Params,
    x,
    taps: tuple[str, ...],
    dtype=jnp.float32,
):
    """Run the conv stack, returning {tap_name: activation}.

    Tap names follow the reference's naming walk (transform_base.py:433-447):
    conv_i / relu_i count Conv2d layers 1-based; pool_i after max pools.
    Stops as soon as every requested tap has been collected.
    """
    cfg = CFGS[params["cfg"]]
    x = x.astype(dtype)
    out: dict[str, jax.Array] = {}
    want = set(taps)
    ci = 0
    li = 0
    for v in cfg:
        if not want - set(out):
            break
        if v == "M":
            x = lax.reduce_window(
                x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            name = f"pool_{ci}"
        else:
            p = params["convs"][li]
            li += 1
            ci += 1
            x = lax.conv_general_dilated(
                x,
                p["w"].astype(x.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["b"].astype(x.dtype)
            name = f"conv_{ci}"
            if name in want:
                out[name] = x
            x = jax.nn.relu(x)
            name = f"relu_{ci}"
        if name in want:
            out[name] = x
    return out


def gram_matrix(feat):
    """Gram matrix over spatial positions, NHWC ([B,H,W,C] -> [B,C,C]).

    Matches BP.py:173-184 / perceptual-style normalization by (C*H*W).
    """
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    g = jnp.einsum("bnc,bnd->bcd", f, f)
    return g / (c * h * w)
