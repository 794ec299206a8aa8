"""pytorch_GAN_zoo progressive generator ("PGAN", the torch.hub model the
reference's pggan engine loads: celebAHQ-512 etc., pggan
transform_base.py:554-566), TPU-native JAX NHWC.

Structure (facebookresearch/pytorch_GAN_zoo GNet): pixel-norm on z, an
equalized Linear "format layer" to 4x4 x depth0, pixel-norm, a group of
3x3 equalized convs at 4x4, then per scale: nearest x2 upsample + two 3x3
equalized convs (LeakyReLU 0.2 then pixel-norm after each), per-scale
toRGB 1x1, with alpha blending of the previous scale during fade-in.
Equalized layers apply sqrt(2/fan_in) at runtime; biases start at zero.

The converter (io.torch_convert.convert_ganzoo_pgan) infers the depth
ladder from the checkpoint's tensor shapes, so any zoo resolution loads.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]


def pixel_norm(x, eps: float = 1e-8):
    return x / jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _eq_scale_conv(w):
    kh, kw, cin, _ = w.shape
    return math.sqrt(2.0 / (cin * kh * kw))


def _conv(p, x, padding=1):
    w = p["w"]
    out = lax.conv_general_dilated(
        x,
        (w * _eq_scale_conv(w)).astype(x.dtype),
        (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _upscale(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def init_generator(key, dim_latent: int = 512,
                   depths=(512, 512, 512, 512, 256, 128, 64, 32)) -> Params:
    """depths[0] is the 4x4 depth; each later entry adds a x2 scale."""
    ks = iter(jax.random.split(key, 4 * len(depths) + 4))
    d0 = depths[0]
    params: Params = {
        "format": {
            "w": jax.random.normal(next(ks), (dim_latent, d0 * 16), jnp.float32),
            "b": jnp.zeros((d0 * 16,), jnp.float32),
        },
        "group_scale0": [
            {"w": jax.random.normal(next(ks), (3, 3, d0, d0), jnp.float32),
             "b": jnp.zeros((d0,), jnp.float32)}
        ],
        "scales": [],
        "to_rgbs": [
            {"w": jax.random.normal(next(ks), (1, 1, d0, 3), jnp.float32),
             "b": jnp.zeros((3,), jnp.float32)}
        ],
    }
    prev = d0
    for d in depths[1:]:
        params["scales"].append(
            [
                {"w": jax.random.normal(next(ks), (3, 3, prev, d), jnp.float32),
                 "b": jnp.zeros((d,), jnp.float32)},
                {"w": jax.random.normal(next(ks), (3, 3, d, d), jnp.float32),
                 "b": jnp.zeros((d,), jnp.float32)},
            ]
        )
        params["to_rgbs"].append(
            {"w": jax.random.normal(next(ks), (1, 1, d, 3), jnp.float32),
             "b": jnp.zeros((3,), jnp.float32)}
        )
        prev = d
    return params


def resolution(params: Params) -> int:
    return 4 * 2 ** len(params["scales"])


def generator_forward(params: Params, z, alpha: float = 0.0, dtype=jnp.float32):
    """z [B, dim_latent] -> [B, R, R, 3]. alpha in (0,1) blends the previous
    scale's rgb during fade-in (GNet's alpha semantics: 0 = fully grown)."""
    z = z.astype(dtype)
    x = pixel_norm(z)
    fw = params["format"]["w"]
    scale = math.sqrt(2.0 / fw.shape[0])
    x = x @ (fw * scale).astype(dtype) + params["format"]["b"].astype(dtype)
    x = jax.nn.leaky_relu(x, 0.2)
    d0 = fw.shape[1] // 16
    # torch views the flat vector as (C, 4, 4) — channel-major
    x = x.reshape(x.shape[0], d0, 4, 4).transpose(0, 2, 3, 1)
    x = pixel_norm(x)
    for conv in params["group_scale0"]:
        x = pixel_norm(jax.nn.leaky_relu(_conv(conv, x), 0.2))

    prev_rgb = None
    n = len(params["scales"])
    for si, group in enumerate(params["scales"]):
        if si == n - 1 and 0 < alpha < 1:
            prev_rgb = _upscale(_conv(params["to_rgbs"][si], x, padding=0))
        x = _upscale(x)
        for conv in group:
            x = pixel_norm(jax.nn.leaky_relu(_conv(conv, x), 0.2))
    out = _conv(params["to_rgbs"][-1], x, padding=0)
    if prev_rgb is not None:
        out = alpha * prev_rgb + (1.0 - alpha) * out
    return out.astype(jnp.float32)
