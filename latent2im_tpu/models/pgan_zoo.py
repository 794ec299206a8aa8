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


def init_discriminator(key, dim_latent: int = 512,
                       depths=(512, 512, 512, 512, 256, 128, 64, 32),
                       decision_dim: int = 1,
                       minibatch_stddev: bool = True) -> Params:
    """Zoo DNet mirror: per-scale fromRGB + two equalized 3x3 convs +
    avg-pool down; 4x4 group (optional minibatch-std channel, 3x3 conv,
    flatten, equalized linear) + decision layer."""
    ks = iter(jax.random.split(key, 4 * len(depths) + 6))
    d0 = depths[0]
    # NOTE: no flag leaf in the tree — whether the std channel exists is
    # inferred structurally from group0_conv's input width (param pytrees
    # hold only float array leaves, per the repo jit-argument contract)
    params: Params = {"from_rgb": [], "scales": []}
    for d in depths:
        params["from_rgb"].append(
            {"w": jax.random.normal(next(ks), (1, 1, 3, d), jnp.float32),
             "b": jnp.zeros((d,), jnp.float32)}
        )
    prev = d0
    for d in depths[1:]:
        # stored shallwest-first to mirror the generator's ladder
        params["scales"].append(
            [
                {"w": jax.random.normal(next(ks), (3, 3, d, d), jnp.float32),
                 "b": jnp.zeros((d,), jnp.float32)},
                {"w": jax.random.normal(next(ks), (3, 3, d, prev), jnp.float32),
                 "b": jnp.zeros((prev,), jnp.float32)},
            ]
        )
        prev = d
    extra = 1 if minibatch_stddev else 0
    params["group0_conv"] = {
        "w": jax.random.normal(next(ks), (3, 3, d0 + extra, d0), jnp.float32),
        "b": jnp.zeros((d0,), jnp.float32),
    }
    params["group0_lin"] = {
        "w": jax.random.normal(next(ks), (d0 * 16, d0), jnp.float32),
        "b": jnp.zeros((d0,), jnp.float32),
    }
    params["decision"] = {
        "w": jax.random.normal(next(ks), (d0, decision_dim), jnp.float32),
        "b": jnp.zeros((decision_dim,), jnp.float32),
    }
    return params


def _eq_linear(p, x):
    scale = math.sqrt(2.0 / p["w"].shape[0])
    return x @ (p["w"] * scale).astype(x.dtype) + p["b"].astype(x.dtype)


def _avg_pool2(x):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _minibatch_stddev_zoo(x, sub_group_size: int = 4):
    """Zoo miniBatchStdDev (pytorch_GAN_zoo networks/mini_batch_stddev_module
    semantics): CONTIGUOUS subgroups of size min(B,4) (whole batch if it
    doesn't divide), per-group UNBIASED std averaged over all dims, each
    group's stat assigned to its own members."""
    b = x.shape[0]
    sub = min(b, sub_group_size)
    if b % sub != 0:
        sub = b
    if sub <= 1:
        stat = jnp.zeros((b, x.shape[1], x.shape[2], 1), x.dtype)
        return jnp.concatenate([x, stat], axis=-1)
    n_groups = b // sub
    y = x.reshape(n_groups, sub, *x.shape[1:])
    std = jnp.sqrt(jnp.var(y, axis=1, ddof=1) + 1e-8)  # torch.var default
    stat = jnp.mean(std.reshape(n_groups, -1), axis=1)  # [G]
    stat = jnp.repeat(stat, sub).reshape(b, 1, 1, 1)
    return jnp.concatenate(
        [x, jnp.broadcast_to(stat, (b, x.shape[1], x.shape[2], 1)).astype(x.dtype)],
        axis=-1,
    )


def discriminator_forward(params: Params, img, dtype=jnp.float32):
    """img at the full resolution of the ladder -> [B, decision_dim]."""
    x = img.astype(dtype)
    n = len(params["scales"])
    x = jax.nn.leaky_relu(_conv(params["from_rgb"][-1], x, padding=0), 0.2)
    for si in range(n - 1, -1, -1):
        group = params["scales"][si]
        x = jax.nn.leaky_relu(_conv(group[0], x), 0.2)
        x = jax.nn.leaky_relu(_conv(group[1], x), 0.2)
        x = _avg_pool2(x)
    # std channel iff group0_conv expects one extra input channel
    if params["group0_conv"]["w"].shape[2] == params["group0_conv"]["w"].shape[3] + 1:
        x = _minibatch_stddev_zoo(x)
    x = jax.nn.leaky_relu(_conv(params["group0_conv"], x), 0.2)
    # torch flattens channel-major
    x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
    x = jax.nn.leaky_relu(_eq_linear(params["group0_lin"], x), 0.2)
    return _eq_linear(params["decision"], x).astype(jnp.float32)


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

    # shared spatial-partitioning hook (parallel/spatial.py; identity when
    # inactive): rows shard over 'spatial', rgb re-constrains to batch-only
    from .hooks import spatial_boundary as _spatial_boundary, \
        spatial_constrain as _spatial_constrain

    prev_rgb = None
    n = len(params["scales"])
    for si, group in enumerate(params["scales"]):
        if si == n - 1 and 0 < alpha < 1:
            prev_rgb = _upscale(_conv(params["to_rgbs"][si], x, padding=0))
        x = _upscale(x)
        for conv in group:
            x = pixel_norm(jax.nn.leaky_relu(_conv(conv, x), 0.2))
        x = _spatial_constrain(x)
    out = _conv(params["to_rgbs"][-1], x, padding=0)
    if prev_rgb is not None:
        out = alpha * prev_rgb + (1.0 - alpha) * out
    return _spatial_boundary(out.astype(jnp.float32))
