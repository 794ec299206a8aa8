"""LPIPS perceptual metric — VGG16 backbone + learned linear heads (NHWC).

The reference's quality story ends at a VGG-distance proxy; BASELINE.json's
parity target is LPIPS-proper, i.e. the learned metric of Zhang et al. 2018
("The Unreasonable Effectiveness of Deep Features..."), 'vgg' variant:

    x in [-1,1] -> fixed channel scaling -> VGG16 relu1_2/2_2/3_3/4_3/5_3
    -> unit-normalize each feature map over channels
    -> squared difference -> learned non-negative 1x1 head per tap
    -> spatial mean -> sum over taps.

Weight layout matches the official PerceptualSimilarity release so the
published ``vgg.pth`` lin heads convert directly (io/torch_convert.
convert_lpips); the VGG16 backbone rides the torchvision converter that the
content/gram losses already use.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import vgg as vggm

Params = dict[str, Any]

# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 in this repo's tap naming
LPIPS_TAPS = ("relu_2", "relu_4", "relu_7", "relu_10", "relu_13")
LPIPS_CHANNELS = (64, 128, 256, 512, 512)

# the official ScalingLayer constants (shift/scale applied to [-1,1] inputs)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def init_lpips(key, vgg_params: Params | None = None) -> Params:
    """Random-head LPIPS (for tests/smoke; real runs convert vgg.pth heads).

    vgg_params: a vgg16 tree from models.vgg (randomly initialized here when
    omitted)."""
    kv, kl = jax.random.split(key)
    if vgg_params is None:
        vgg_params = vggm.init_vgg(kv, "vgg16")
    assert vgg_params["cfg"] == "vgg16", "LPIPS-vgg uses a vgg16 backbone"
    lin_keys = jax.random.split(kl, len(LPIPS_CHANNELS))
    lins = [
        {"w": jax.random.uniform(k, (c,), jnp.float32, 0.0, 0.1)}
        for k, c in zip(lin_keys, LPIPS_CHANNELS)
    ]
    return {"vgg": vgg_params, "lins": lins}


def _scaling_layer(x):
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    return (x - shift) / scale


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips_forward(params: Params, x0, x1, dtype=jnp.float32):
    """LPIPS(x0, x1) -> [B]. Inputs NHWC in [-1, 1]."""
    f0 = vggm.vgg_features(params["vgg"], _scaling_layer(x0.astype(dtype)),
                           LPIPS_TAPS, dtype=dtype)
    f1 = vggm.vgg_features(params["vgg"], _scaling_layer(x1.astype(dtype)),
                           LPIPS_TAPS, dtype=dtype)
    total = 0.0
    for tap, lin in zip(LPIPS_TAPS, params["lins"]):
        d = jnp.square(_unit_normalize(f0[tap]) - _unit_normalize(f1[tap]))
        # learned non-negative 1x1 head -> spatial average
        val = jnp.mean(jnp.sum(d * lin["w"].astype(d.dtype), axis=-1),
                       axis=(1, 2))
        total = total + val
    return total
