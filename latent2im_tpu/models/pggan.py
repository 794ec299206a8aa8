"""Progressive GAN (PGGAN-256/1024 ladder), TPU-native JAX (NHWC).

Re-creates the capability of the reference's graphs/pggan/model_256.py:
label-embedding + PixelNorm input, a 9-block progressive ladder
(4x4 ... 1024x1024, channels 512...16), per-resolution to_rgb, and the
step/alpha fade-in forward; the mirrored discriminator with per-resolution
from_rgb, avg-pool downsampling, the batch-std channel, and a (score, label
logits) head (model_256.py:188-353).

Conventions:
  * EqualLR convs store raw N(0,1) weights; runtime scale sqrt(2/fan_in)
    (model_256.py:70-99).
  * ConvBlock (G): conv -> PixelNorm -> LeakyReLU(0.2), twice
    (PixelNorm over channels BEFORE the activation, model_256.py:164-173);
    D blocks drop the PixelNorm.
  * to_rgb/from_rgb are plain convs (no equalized LR).
  * `step` selects the output resolution (6 -> 256) and is static under jit;
    alpha in [0,1) blends the previous resolution's rgb during fade-in.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

N_LABEL = 10
CODE_DIM = 512 - N_LABEL

# (in_ch, out_ch) per progression block; block 0 is the 4x4 stem
G_LADDER = [
    (512, 512), (512, 512), (512, 512), (512, 512),
    (512, 256), (256, 128), (128, 64), (64, 32), (32, 16),
]
# D ladder runs the reverse; the final block consumes the +1 std channel
D_LADDER = [
    (16, 32), (32, 64), (64, 128), (128, 256), (256, 512),
    (512, 512), (512, 512), (512, 512), (512, 512), (513, 512),
]
D_FROM_RGB = [16, 32, 64, 128, 256, 512, 512, 512, 512, 512]


def step_to_resolution(step: int) -> int:
    return 4 * (2**step)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def pixel_norm(x, eps: float = 1e-8):
    return x / jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def _init_equal_conv(key, kh, kw, cin, cout):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _equal_conv(p, x, padding):
    kh, kw, cin, _ = p["w"].shape
    scale = math.sqrt(2.0 / (cin * kh * kw))  # EqualLR (model_256.py:74-78)
    out = lax.conv_general_dilated(
        x,
        (p["w"] * scale).astype(x.dtype),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _init_plain_conv(key, kh, kw, cin, cout):
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw_, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
    }


def _plain_conv(p, x, padding=0):
    out = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(out.dtype)


def _upsample_nearest(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _avg_pool2(x):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


# ---------------------------------------------------------------------------
# conv blocks
# ---------------------------------------------------------------------------


def init_conv_block(key, cin, cout, k1, p1, k2=None, p2=None):
    k2 = k2 or k1
    ka, kb = jax.random.split(key)
    return {
        "conv1": _init_equal_conv(ka, k1, k1, cin, cout),
        "conv2": _init_equal_conv(kb, k2, k2, cout, cout),
    }


def block_pads(block_idx: int, n_blocks: int, is_g: bool) -> tuple[int, int]:
    """Pads are structural (4x4 stem pad 3 / final-D 4x4 valid), kept out of
    the param tree so every leaf stays a float array."""
    if is_g:
        return (3, 1) if block_idx == 0 else (1, 1)
    return (1, 0) if block_idx == n_blocks - 1 else (1, 1)


def conv_block(p, x, use_pixel_norm: bool, pads=(1, 1)):
    p1, p2 = pads
    x = _equal_conv(p["conv1"], x, p1)
    if use_pixel_norm:
        x = pixel_norm(x)
    x = jax.nn.leaky_relu(x, 0.2)
    x = _equal_conv(p["conv2"], x, p2)
    if use_pixel_norm:
        x = pixel_norm(x)
    return jax.nn.leaky_relu(x, 0.2)


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


def init_generator(key, n_label: int = N_LABEL) -> Params:
    """n_label=10 matches model_256.py (code 502 + label embed 10 -> 512);
    n_label=0 is the hub-PGAN shape (plain 512-d z, no label embedding,
    which is what the reference actually runs: pggan transform_base.py:554-566).
    """
    keys = jax.random.split(key, 2 * len(G_LADDER) + 1)
    ki = iter(keys)
    params: Params = {
        "progression": [],
        "to_rgb": [],
    }
    if n_label > 0:
        params["label_embed"] = jax.random.normal(
            next(ki), (n_label, n_label), jnp.float32
        )
    for i, (cin, cout) in enumerate(G_LADDER):
        if i == 0:
            params["progression"].append(
                init_conv_block(next(ki), cin, cout, 4, 3, 3, 1)
            )
        else:
            params["progression"].append(
                init_conv_block(next(ki), cin, cout, 3, 1)
            )
        params["to_rgb"].append(_init_plain_conv(next(ki), 1, 1, cout, 3))
    return params


def generator_forward(params: Params, z, step: int = 6, alpha: float = 0.0,
                      label=None, dtype=jnp.float32):
    """z: [B, 502] -> image [B, R, R, 3], R = 4 * 2**step.

    label: int32 [B] (defaults to zeros, matching model_256.py:232).
    alpha in [0,1) blends the previous resolution during fade-in; the
    DEFAULT alpha=0 matches the reference's call sites (model_256.py forward
    defaults step=6, alpha=0 and transform_base.py:314 calls netG(z) bare),
    whose blend then outputs 100% of the PREVIOUS resolution's rgb head on an
    upsampled feature map — a reference quirk, reproduced for checkpoint
    parity. The reference's `0 <= alpha < 1` gate means alpha=1 (or any value outside
    [0,1)) disables blending.
    """
    z = z.astype(dtype)
    b = z.shape[0]
    if "label_embed" in params:
        if label is None:
            label = jnp.zeros((b,), jnp.int32)
        emb = params["label_embed"][label].astype(dtype)  # [B, n_label]
        out = jnp.concatenate([pixel_norm(z), emb], axis=-1)[:, None, None, :]
    else:
        out = pixel_norm(z)[:, None, None, :]

    # spatial-partitioning hook shared with stylegan2 (parallel/spatial.py
    # installs it; identity when inactive): activation rows shard over the
    # 'spatial' mesh axis, and the rgb output re-constrains to batch-only
    # sharding so consumer towers never inherit an over-sharded H
    from .hooks import spatial_boundary as _spatial_boundary, \
        spatial_constrain as _spatial_constrain

    upsample = None
    for i in range(step + 1):
        blk = params["progression"][i]
        pads = block_pads(i, len(params["progression"]), is_g=True)
        if i > 0 and step > 0:
            upsample = _upsample_nearest(out)
            out = conv_block(blk, upsample, use_pixel_norm=True, pads=pads)
        else:
            out = conv_block(blk, out, use_pixel_norm=True, pads=pads)
        out = _spatial_constrain(out)
        if i == step:
            out = _plain_conv(params["to_rgb"][i], out)
            if i > 0 and 0 <= alpha < 1:
                skip_rgb = _plain_conv(params["to_rgb"][i - 1], upsample)
                out = (1 - alpha) * skip_rgb + alpha * out
    return _spatial_boundary(out.astype(jnp.float32))


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


def init_discriminator(key, n_label: int = N_LABEL) -> Params:
    keys = jax.random.split(key, 2 * len(D_LADDER) + 2)
    ki = iter(keys)
    params: Params = {"progression": [], "from_rgb": []}
    for i, (cin, cout) in enumerate(D_LADDER):
        if i == len(D_LADDER) - 1:
            params["progression"].append(
                init_conv_block(next(ki), cin, cout, 3, 1, 4, 0)
            )
        else:
            params["progression"].append(init_conv_block(next(ki), cin, cout, 3, 1))
        params["from_rgb"].append(_init_plain_conv(next(ki), 1, 1, 3, D_FROM_RGB[i]))
    klin, kb = jax.random.split(next(ki))
    bound = 1.0 / math.sqrt(512)
    params["linear"] = {
        "w": jax.random.uniform(klin, (512, 1 + n_label), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (1 + n_label,), jnp.float32, -bound, bound),
    }
    return params


def discriminator_forward(params: Params, img, step: int = 6, alpha: float = 0.0,
                          dtype=jnp.float32):
    """-> (score [B], label_logits [B, n_label]) (model_256.py:329-353)."""
    x = img.astype(dtype)
    n_layer = len(params["progression"])
    out = None
    for i in range(step, -1, -1):
        index = n_layer - i - 1
        if i == step:
            out = _plain_conv(params["from_rgb"][index], x)
        if i == 0:
            # batch-std channel from the ORIGINAL image (model_256.py:335-337);
            # torch's input.std(0) default is UNBIASED (ddof=1)
            mean_std = jnp.mean(jnp.std(x, axis=0, ddof=1))
            std_map = jnp.full(
                (out.shape[0], out.shape[1], out.shape[2], 1), mean_std, out.dtype
            )
            out = jnp.concatenate([out, std_map], axis=-1)
        out = conv_block(
            params["progression"][index], out, use_pixel_norm=False,
            pads=block_pads(index, n_layer, is_g=False),
        )
        if i > 0:
            out = _avg_pool2(out)
            if i == step and 0 <= alpha < 1:
                skip_rgb = _plain_conv(params["from_rgb"][index + 1], _avg_pool2(x))
                out = (1 - alpha) * skip_rgb + alpha * out
    out = out.reshape(out.shape[0], -1)
    out = out @ params["linear"]["w"].astype(out.dtype) + params["linear"]["b"].astype(
        out.dtype
    )
    return out[:, 0].astype(jnp.float32), out[:, 1:].astype(jnp.float32)
