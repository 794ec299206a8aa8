"""Fused bias-add + LeakyReLU + gain — the StyleGAN2 activation, TPU-native.

Matches the reference CUDA op (graphs/stylegan_v2_real/op/fused_act.py:85-86,
op/fused_bias_act_kernel.cu:36-45):

    y = leaky_relu(x + bias, negative_slope) * scale        (scale = sqrt(2))

Bias broadcasts along the channel axis — the *last* axis here (NHWC / [..., C]),
where the reference broadcasts along dim 1 (NCHW).

The XLA path is a plain jnp expression: XLA fuses it into the producing conv,
which is exactly what the hand-written CUDA kernel buys the reference. A Pallas
variant (with the reference's output-sign backward rule as a custom VJP) is
provided for the fully-fused conv-epilogue path and parity-tested against this.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jax.Array,
    bias: jax.Array | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
    impl: str | None = None,
) -> jax.Array:
    """y = leaky_relu(x + bias) * scale, bias broadcast over the last axis."""
    if impl == "pallas":
        from . import pallas_kernels

        if bias is None:  # the kernel signature is bias-full; fold zeros in
            bias = jnp.zeros((x.shape[-1],), x.dtype)
        return pallas_kernels.fused_leaky_relu_pallas(x, bias, negative_slope, scale)
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale
