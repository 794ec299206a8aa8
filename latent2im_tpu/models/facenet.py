"""InceptionResnetV1 (facenet, VGGFace2) identity embedder, JAX NHWC.

The reference's eval.py:29-32 uses facenet_pytorch's
InceptionResnetV1(pretrained='vggface2') to embed 160x160 faces for the
identity-preservation metric. This re-creates that architecture as a pure
function with a converter for facenet_pytorch state_dicts
(io.torch_convert.convert_facenet); BatchNorm runs frozen (eval-only tower).

Structure: stem convs -> 5x Block35 (scale .17) -> Mixed_6a -> 10x Block17
(scale .10) -> Mixed_7a -> 5x Block8 (scale .20) -> Block8(noReLU) ->
global avgpool -> Linear(1792->512, no bias) -> BatchNorm1d -> L2 normalize.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

BN_EPS = 1e-3


def _conv(w, x, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=(
            (padding[0], padding[0]),
            (padding[1], padding[1]),
        ),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(p, x):
    inv = lax.rsqrt(p["var"] + BN_EPS)
    return (x - p["mean"].astype(x.dtype)) * (inv * p["gamma"]).astype(x.dtype) + p[
        "beta"
    ].astype(x.dtype)


def basic_conv(p, x, stride=1, padding=(0, 0)):
    return jax.nn.relu(_bn(p["bn"], _conv(p["w"], x, stride, padding)))


def _init_basic(key, kh, kw, cin, cout):
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * 0.05,
        "bn": {
            "gamma": jnp.ones((cout,), jnp.float32),
            "beta": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        },
    }


def _init_conv_b(key, kh, kw, cin, cout):
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw_, (kh, kw, cin, cout), jnp.float32) * 0.05,
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _max_pool3s2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def init_facenet(key) -> Params:
    ks = iter(jax.random.split(key, 256))
    p: Params = {
        "conv2d_1a": _init_basic(next(ks), 3, 3, 3, 32),
        "conv2d_2a": _init_basic(next(ks), 3, 3, 32, 32),
        "conv2d_2b": _init_basic(next(ks), 3, 3, 32, 64),
        "conv2d_3b": _init_basic(next(ks), 1, 1, 64, 80),
        "conv2d_4a": _init_basic(next(ks), 3, 3, 80, 192),
        "conv2d_4b": _init_basic(next(ks), 3, 3, 192, 256),
        "repeat_1": [],
        "repeat_2": [],
        "repeat_3": [],
    }
    for _ in range(5):  # Block35
        p["repeat_1"].append(
            {
                "branch0": _init_basic(next(ks), 1, 1, 256, 32),
                "branch1": [_init_basic(next(ks), 1, 1, 256, 32),
                            _init_basic(next(ks), 3, 3, 32, 32)],
                "branch2": [_init_basic(next(ks), 1, 1, 256, 32),
                            _init_basic(next(ks), 3, 3, 32, 32),
                            _init_basic(next(ks), 3, 3, 32, 32)],
                "conv2d": _init_conv_b(next(ks), 1, 1, 96, 256),
            }
        )
    p["mixed_6a"] = {
        "branch0": _init_basic(next(ks), 3, 3, 256, 384),
        "branch1": [_init_basic(next(ks), 1, 1, 256, 192),
                    _init_basic(next(ks), 3, 3, 192, 192),
                    _init_basic(next(ks), 3, 3, 192, 256)],
    }
    for _ in range(10):  # Block17
        p["repeat_2"].append(
            {
                "branch0": _init_basic(next(ks), 1, 1, 896, 128),
                "branch1": [_init_basic(next(ks), 1, 1, 896, 128),
                            _init_basic(next(ks), 1, 7, 128, 128),
                            _init_basic(next(ks), 7, 1, 128, 128)],
                "conv2d": _init_conv_b(next(ks), 1, 1, 256, 896),
            }
        )
    p["mixed_7a"] = {
        "branch0": [_init_basic(next(ks), 1, 1, 896, 256),
                    _init_basic(next(ks), 3, 3, 256, 384)],
        "branch1": [_init_basic(next(ks), 1, 1, 896, 256),
                    _init_basic(next(ks), 3, 3, 256, 256)],
        "branch2": [_init_basic(next(ks), 1, 1, 896, 256),
                    _init_basic(next(ks), 3, 3, 256, 256),
                    _init_basic(next(ks), 3, 3, 256, 256)],
    }
    for _ in range(6):  # 5x Block8 + final noReLU Block8
        p["repeat_3"].append(
            {
                "branch0": _init_basic(next(ks), 1, 1, 1792, 192),
                "branch1": [_init_basic(next(ks), 1, 1, 1792, 192),
                            _init_basic(next(ks), 1, 3, 192, 192),
                            _init_basic(next(ks), 3, 1, 192, 192)],
                "conv2d": _init_conv_b(next(ks), 1, 1, 384, 1792),
            }
        )
    p["last_linear"] = {
        "w": jax.random.normal(next(ks), (1792, 512), jnp.float32) * 0.02
    }
    p["last_bn"] = {
        "gamma": jnp.ones((512,), jnp.float32),
        "beta": jnp.zeros((512,), jnp.float32),
        "mean": jnp.zeros((512,), jnp.float32),
        "var": jnp.ones((512,), jnp.float32),
    }
    return p


def _block35(p, x, scale=0.17):
    b0 = basic_conv(p["branch0"], x)
    b1 = basic_conv(p["branch1"][0], x)
    b1 = basic_conv(p["branch1"][1], b1, padding=1)
    b2 = basic_conv(p["branch2"][0], x)
    b2 = basic_conv(p["branch2"][1], b2, padding=1)
    b2 = basic_conv(p["branch2"][2], b2, padding=1)
    up = jnp.concatenate([b0, b1, b2], axis=-1)
    up = _conv(p["conv2d"]["w"], up) + p["conv2d"]["b"].astype(x.dtype)
    return jax.nn.relu(x + scale * up)


def _block17(p, x, scale=0.10):
    b0 = basic_conv(p["branch0"], x)
    b1 = basic_conv(p["branch1"][0], x)
    b1 = basic_conv(p["branch1"][1], b1, padding=(0, 3))
    b1 = basic_conv(p["branch1"][2], b1, padding=(3, 0))
    up = jnp.concatenate([b0, b1], axis=-1)
    up = _conv(p["conv2d"]["w"], up) + p["conv2d"]["b"].astype(x.dtype)
    return jax.nn.relu(x + scale * up)


def _block8(p, x, scale=0.20, relu=True):
    b0 = basic_conv(p["branch0"], x)
    b1 = basic_conv(p["branch1"][0], x)
    b1 = basic_conv(p["branch1"][1], b1, padding=(0, 1))
    b1 = basic_conv(p["branch1"][2], b1, padding=(1, 0))
    up = jnp.concatenate([b0, b1], axis=-1)
    up = _conv(p["conv2d"]["w"], up) + p["conv2d"]["b"].astype(x.dtype)
    out = x + scale * up
    return jax.nn.relu(out) if relu else out


def facenet_forward(params: Params, x, dtype=jnp.float32):
    """x: [B, 160, 160, 3] in facenet's (img-127.5)/128 scale -> [B, 512]
    L2-normalized embeddings."""
    x = x.astype(dtype)
    x = basic_conv(params["conv2d_1a"], x, stride=2)
    x = basic_conv(params["conv2d_2a"], x)
    x = basic_conv(params["conv2d_2b"], x, padding=1)
    x = _max_pool3s2(x)
    x = basic_conv(params["conv2d_3b"], x)
    x = basic_conv(params["conv2d_4a"], x)
    x = basic_conv(params["conv2d_4b"], x, stride=2)
    for blk in params["repeat_1"]:
        x = _block35(blk, x)
    m = params["mixed_6a"]
    x = jnp.concatenate(
        [
            basic_conv(m["branch0"], x, stride=2),
            basic_conv(
                m["branch1"][2],
                basic_conv(m["branch1"][1], basic_conv(m["branch1"][0], x), padding=1),
                stride=2,
            ),
            _max_pool3s2(x),
        ],
        axis=-1,
    )
    for blk in params["repeat_2"]:
        x = _block17(blk, x)
    m = params["mixed_7a"]
    x = jnp.concatenate(
        [
            basic_conv(m["branch0"][1], basic_conv(m["branch0"][0], x), stride=2),
            basic_conv(m["branch1"][1], basic_conv(m["branch1"][0], x), stride=2),
            basic_conv(
                m["branch2"][2],
                basic_conv(m["branch2"][1], basic_conv(m["branch2"][0], x), padding=1),
                stride=2,
            ),
            _max_pool3s2(x),
        ],
        axis=-1,
    )
    for blk in params["repeat_3"][:-1]:
        x = _block8(blk, x)
    x = _block8(params["repeat_3"][-1], x, scale=1.0, relu=False)
    x = jnp.mean(x, axis=(1, 2))
    x = x @ params["last_linear"]["w"].astype(x.dtype)
    x = (x - params["last_bn"]["mean"].astype(x.dtype)) * (
        lax.rsqrt(params["last_bn"]["var"] + BN_EPS) * params["last_bn"]["gamma"]
    ).astype(x.dtype) + params["last_bn"]["beta"].astype(x.dtype)
    return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.float32)
