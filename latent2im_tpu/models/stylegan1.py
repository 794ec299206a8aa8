"""StyleGAN1-style progressive generator (the reference's 128/1024 'model.py'
path), TPU-native JAX NHWC.

Re-creates graphs/pggan/model.py:374-483: a style MLP (PixelNorm + 8x
EqualLinear/LeakyReLU) feeding AdaIN-modulated progressive StyledConvBlocks
with per-resolution noise injection, nearest/fused upsampling with a fixed
[1,2,1] blur, per-resolution to_rgb, step/alpha fade-in, and style mixing.

Fused resampling (model.py:56-111): the equalized-LR weight is padded by one
and 4-tap averaged (the 2x-resample-then-conv equivalence), then applied as a
stride-2 transposed conv (up) or stride-2 conv (down) — here both are single
``conv_general_dilated`` calls on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

G_LADDER = [
    (512, 512), (512, 512), (512, 512), (512, 512),
    (512, 256), (256, 128), (128, 64), (64, 32), (32, 16),
]

BLUR_KERNEL = (
    jnp.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]], jnp.float32) / 16.0
)


def pixel_norm(x, eps=1e-8):
    return x / jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _init_equal_conv(key, kh, kw, cin, cout):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _equal_conv(p, x, padding=0, stride=1):
    kh, kw, cin, _ = p["w"].shape
    scale = math.sqrt(2.0 / (cin * kh * kw))
    out = lax.conv_general_dilated(
        x,
        (p["w"] * scale).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _init_equal_linear(key, din, dout):
    return {
        "w": jax.random.normal(key, (din, dout), jnp.float32),
        "b": jnp.zeros((dout,), jnp.float32),
    }


def _equal_linear(p, x):
    scale = math.sqrt(2.0 / p["w"].shape[0])
    return x @ (p["w"] * scale).astype(x.dtype) + p["b"].astype(x.dtype)


def blur3(x):
    """Depthwise fixed [1,2,1]^2/16 blur, pad 1 (model.py:122-178)."""
    c = x.shape[-1]
    k = jnp.broadcast_to(BLUR_KERNEL[:, :, None, None], (3, 3, 1, c)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _avg4_pad(w):
    """Pad the kernel by 1 and average the 4 shifted copies (model.py:72-79),
    HWIO layout: [k,k,i,o] -> [k+1,k+1,i,o]."""
    wp = jnp.pad(w, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (wp[1:, 1:] + wp[:-1, 1:] + wp[1:, :-1] + wp[:-1, :-1]) / 4.0


def fused_upsample(p, x, padding=1):
    kh = p["w"].shape[0]
    cin = p["w"].shape[2]
    scale = math.sqrt(2.0 / (cin * kh * kh))
    w = _avg4_pad(p["w"] * scale).astype(x.dtype)  # k+1
    kp = w.shape[0]
    pad = kp - 1 - padding
    out = lax.conv_general_dilated(
        x,
        jnp.flip(w, (0, 1)),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def fused_downsample(p, x, padding=1):
    kh = p["w"].shape[0]
    cin = p["w"].shape[2]
    scale = math.sqrt(2.0 / (cin * kh * kh))
    w = _avg4_pad(p["w"] * scale).astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(2, 2),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _upsample_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def instance_norm(x, eps=1e-5):
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps)


def adain(p, x, style):
    """AdaIN: instance-norm then style-conditioned affine (model.py:267-285)."""
    s = _equal_linear(p["style"], style)  # [B, 2C]
    c = x.shape[-1]
    gamma, beta = s[:, :c], s[:, c:]
    return instance_norm(x) * gamma[:, None, None, :] + beta[:, None, None, :]


def _init_adain(key, cin, style_dim):
    p = {"style": _init_equal_linear(key, style_dim, cin * 2)}
    p["style"]["b"] = p["style"]["b"].at[:cin].set(1.0)
    return p


def _init_styled_block(key, cin, cout, style_dim, initial=False, fused=False):
    ks = jax.random.split(key, 8)
    p: Params = {}
    if initial:
        p["const"] = jax.random.normal(ks[0], (1, 4, 4, cin), jnp.float32)
    else:
        p["conv1"] = _init_equal_conv(ks[0], 3, 3, cin, cout)
    p["noise1_w"] = jnp.zeros((cout,), jnp.float32)
    p["adain1"] = _init_adain(ks[1], cout, style_dim)
    p["conv2"] = _init_equal_conv(ks[2], 3, 3, cout, cout)
    p["noise2_w"] = jnp.zeros((cout,), jnp.float32)
    p["adain2"] = _init_adain(ks[3], cout, style_dim)
    return p


def styled_block(p, x, style, noise, initial=False, upsample=False, fused=False):
    if initial:
        out = jnp.tile(p["const"], (style.shape[0], 1, 1, 1)).astype(style.dtype)
    elif upsample:
        if fused:
            out = blur3(fused_upsample(p["conv1"], x))
        else:
            out = blur3(_equal_conv(p["conv1"], _upsample_nearest(x), padding=1))
    else:
        out = _equal_conv(p["conv1"], x, padding=1)
    # equal_lr on the [1,C,1,1] noise weight => runtime scale sqrt(2/C)
    nscale = math.sqrt(2.0 / out.shape[-1])
    out = out + (p["noise1_w"] * nscale).astype(out.dtype) * noise.astype(out.dtype)
    out = jax.nn.leaky_relu(out, 0.2)
    out = adain(p["adain1"], out, style)
    out = _equal_conv(p["conv2"], out, padding=1)
    out = out + (p["noise2_w"] * nscale).astype(out.dtype) * noise.astype(out.dtype)
    out = jax.nn.leaky_relu(out, 0.2)
    out = adain(p["adain2"], out, style)
    return out


def init_styled_generator(key, code_dim: int = 512, n_mlp: int = 8) -> Params:
    ks = iter(jax.random.split(key, 64))
    params: Params = {
        "style": [_init_equal_linear(next(ks), code_dim, code_dim)
                  for _ in range(n_mlp)],
        "progression": [],
        "to_rgb": [],
    }
    for i, (cin, cout) in enumerate(G_LADDER):
        params["progression"].append(
            _init_styled_block(next(ks), cin, cout, code_dim, initial=(i == 0))
        )
        params["to_rgb"].append(_init_equal_conv(next(ks), 1, 1, cout, 3))
    return params


def style_forward(params: Params, z):
    x = pixel_norm(z)
    for p in params["style"]:
        x = jax.nn.leaky_relu(_equal_linear(p, x), 0.2)
    return x


def mean_style(params: Params, key, n: int = 1024, code_dim: int = 512):
    z = jax.random.normal(key, (n, code_dim), jnp.float32)
    return jnp.mean(style_forward(params, z), axis=0, keepdims=True)


def styled_generator_forward(
    params: Params,
    z,
    noise: Sequence | None = None,
    step: int = 5,
    alpha: float = 1.0,
    key=None,
    mean_style_latent=None,
    style_weight: float = 0.0,
    inject_index: Sequence[int] | None = None,
    mixing_range: tuple[int, int] = (-1, -1),
    fused_from: int = 5,
    dtype=jnp.float32,
):
    """z: [B, D] or a list of [B, D] (style mixing). step 5 = 128px.

    mean_style_latent + style_weight implement truncation
    (model.py:494-503); inject_index gives the crossover layers explicitly
    (the reference draws them with random.sample — pass your own draw).
    """
    zs = z if isinstance(z, (list, tuple)) else [z]
    styles = [style_forward(params, s.astype(dtype)) for s in zs]
    b = zs[0].shape[0]
    if noise is None:
        assert key is not None, "need noise list or a PRNG key"
        keys = jax.random.split(key, step + 1)
        noise = [
            jax.random.normal(keys[i], (b, 4 * 2**i, 4 * 2**i, 1), dtype)
            for i in range(step + 1)
        ]
    if mean_style_latent is not None:
        styles = [
            mean_style_latent + style_weight * (s - mean_style_latent)
            for s in styles
        ]
    inject = list(inject_index or [len(params["progression"]) + 1])

    # shared spatial-partitioning hook (parallel/spatial.py; identity when
    # inactive)
    from .hooks import spatial_boundary as _spatial_boundary, \
        spatial_constrain as _spatial_constrain

    out = None
    out_prev = None
    crossover = 0
    for i in range(step + 1):
        if mixing_range == (-1, -1):
            if crossover < len(inject) and i > inject[crossover]:
                crossover = min(crossover + 1, len(styles) - 1)
            style_step = styles[crossover]
        else:
            style_step = (
                styles[1] if mixing_range[0] <= i <= mixing_range[1] else styles[0]
            )
        if i > 0 and step > 0:
            out_prev = out
        out = styled_block(
            params["progression"][i],
            out,
            style_step,
            noise[i],
            initial=(i == 0),
            upsample=(i > 0),
            fused=(i >= fused_from),
        )
        out = _spatial_constrain(out)
        if i == step:
            out = _equal_conv(params["to_rgb"][i], out)
            if i > 0 and 0 <= alpha < 1:
                skip = _equal_conv(params["to_rgb"][i - 1], out_prev)
                skip = _upsample_nearest(skip)
                out = (1 - alpha) * skip + alpha * out
    return _spatial_boundary(out.astype(jnp.float32))
