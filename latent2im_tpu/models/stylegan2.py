"""StyleGAN2 generator + discriminator, TPU-native JAX.

Re-implements the capability of the reference's rosinality-style networks
(reference: graphs/stylegan_v2_real/networks.py) as pure functions over
parameter pytrees, NHWC layout, designed for the MXU:

  * ModulatedConv2d is computed WITHOUT per-sample grouped convs (the
    reference folds batch into conv groups, networks.py:241-270, which maps
    terribly to the MXU). Because conv is linear, modulating the weight's
    input channels == scaling the input channels, and demodulation is a pure
    output-channel scale computed analytically:

        demod[b,o] = rsqrt(scale^2 * sum_i s[b,i]^2 * sum_k W[k,i,o]^2 + eps)

    so every sample shares ONE large conv — batched, MXU-friendly.
  * Up/down-sampling rides `ops.upfirdn2d` (XLA conv / Pallas kernel).
  * The fused bias+LeakyReLU+sqrt(2) epilogue rides `ops.fused_act`.

Parameters are stored in "equalized LR" raw form exactly as the reference
(weights ~ N(0,1) [/ lr_mul], runtime scale 1/sqrt(fan_in) * lr_mul), so
converted PyTorch checkpoints drop in without rescaling (weight layout maps
OIHW -> HWIO and linear [out,in] -> [in,out]; see io/torch_convert.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import fused_act
from ..ops import pair_conv
from ..ops import upfirdn2d_mod as ufd

Params = dict[str, Any]

# channel table (networks.py:384-394)
def channel_table(channel_multiplier: int = 2) -> dict[int, int]:
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


BLUR_KERNEL = (1, 3, 3, 1)
# skip-RGB x2 upsample switches from depthwise upfirdn to the polyphase shift
# form at/above this resolution (see to_rgb)
SKIP_SHIFT_MIN_RES = 128


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def pixel_norm(x, eps=1e-8):
    return x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)


def init_equal_linear(key, in_dim, out_dim, bias=True, bias_init=0.0, lr_mul=1.0):
    p = {"w": jax.random.normal(key, (in_dim, out_dim), jnp.float32) / lr_mul}
    if bias:
        p["b"] = jnp.full((out_dim,), float(bias_init), jnp.float32)
    return p


def equal_linear(p, x, lr_mul=1.0, activation=False, impl=None):
    in_dim = p["w"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = (p["w"] * scale).astype(x.dtype)
    out = x @ w
    b = p.get("b")
    if activation:
        return fused_act.fused_leaky_relu(
            out, None if b is None else b * lr_mul, impl=impl
        )
    if b is not None:
        out = out + (b * lr_mul).astype(out.dtype)
    return out


def init_equal_conv(key, in_ch, out_ch, k, bias=True):
    p = {"w": jax.random.normal(key, (k, k, in_ch, out_ch), jnp.float32)}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def equal_conv2d(p, x, stride=1, padding=0):
    k, _, in_ch, _ = p["w"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    out = lax.conv_general_dilated(
        x,
        (p["w"] * scale).astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def init_modulated_conv(key, in_ch, out_ch, k, style_dim, demodulate=True):
    kw, km = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (k, k, in_ch, out_ch), jnp.float32),
        "mod": init_equal_linear(km, style_dim, in_ch, bias_init=1.0),
    }


def modulated_conv2d(
    p,
    x,
    style,
    demodulate=True,
    up=False,
    down=False,
    blur_kernel=None,
    impl=None,
):
    """Style-modulated conv (networks.py:176-272), batched-equivalence form.

    x: [B,H,W,Cin], style: [B,style_dim]. Returns [B,H',W',Cout].
    """
    k, _, in_ch, out_ch = p["w"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    s = equal_linear(p["mod"], style)  # [B, Cin]

    if demodulate:
        w_sq = jnp.sum(jnp.square(p["w"]), axis=(0, 1))  # [Cin, Cout]
        sigma = (scale * scale) * (jnp.square(s) @ w_sq)  # [B, Cout]
        demod = lax.rsqrt(sigma + 1e-8)

    xs = x * s[:, None, None, :].astype(x.dtype)
    w = (p["w"] * scale).astype(x.dtype)

    if up:
        # conv_transpose2d(stride=2, pad=0) == dilated conv with flipped taps.
        # (A fused convT+blur polyphase variant exists in stylegan2_fast and
        # measured SLOWER here at mid resolutions — 75 vs 83 img/s — XLA's
        # dilated-conv lowering + blur fusion wins outside the narrow-channel
        # final block, which the fast tail covers.)
        out = lax.conv_general_dilated(
            xs,
            jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=((k - 1, k - 1), (k - 1, k - 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        blur = ufd.make_kernel(list(blur_kernel or BLUR_KERNEL))
        p_ = len(blur_kernel or BLUR_KERNEL) - 2 - (k - 1)
        pad0 = (p_ + 1) // 2 + 1
        pad1 = p_ // 2 + 1
        out = ufd.blur2d(out, blur, pad=(pad0, pad1), upsample_factor=2, impl=impl)
    elif down:
        blur = ufd.make_kernel(list(blur_kernel or BLUR_KERNEL))
        p_ = len(blur_kernel or BLUR_KERNEL) - 2 + (k - 1)
        pad0 = (p_ + 1) // 2
        pad1 = p_ // 2
        xs = ufd.blur2d(xs, blur, pad=(pad0, pad1), impl=impl)
        out = lax.conv_general_dilated(
            xs,
            w,
            window_strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    else:
        h = xs.shape[1]
        if (
            k == 3
            and in_ch <= S2D_MAX_CH
            and h >= S2D_MIN_RES
            and h % 2 == 0
            and xs.shape[2] % 2 == 0
        ):
            out = _conv3x3_s2d(xs, w)
        else:
            pad = k // 2
            out = lax.conv_general_dilated(
                xs,
                w,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

    if demodulate:
        out = out * demod[:, None, None, :].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# space-to-depth 3x3 conv (high-res small-channel layers)
# ---------------------------------------------------------------------------
#
# The top-resolution StyleGAN2 layers have few channels (32 @ 1024, 64 @ 512)
# so a plain 3x3 conv uses a quarter of the MXU's 128 lanes (profiled at
# ~10 TF/s vs ~41 TF/s for the 64-ch layer below it). Folding 2x2 spatial
# blocks into channels turns the 3x3/H/W/C conv into an equivalent
# 2x2/(H/2)/(W/2)/4C conv with full lanes. Exact rearrangement, no math
# change: y[2m+py,2n+px,co] = sum_{dy,dx,ci} K[dy+1,dx+1,ci,co] x[...]
# maps to a 2x2 window over the block grid with kernel entries scattered by
# dy = 2(dy_blk-1) + ry - py (zero where |dy|>1).

# OFF by default: the isolated rewrite loses end-to-end (56 vs 75 img/s at
# 1024px) because the s2d/d2s boundary relayouts on full-res activations cost
# more than the MXU win. To profit, the whole top block (conv-up output,
# noise/act, ToRGB) must stay resident in s2d form — future work; the
# equivalence is correct and tested (tests/test_s2d_conv.py). Set
# S2D_MIN_RES to e.g. 256 to experiment. Measured round 3 at 512 (s2d form
# for the dominant 512-res 64ch conv2): 113 vs 138.3 img/s END-TO-END — the
# 1.78x structural-zero FLOP inflation loses more than full lanes win, like
# every other phase-kernel rewrite (BASELINE.md negative results). Stays off.
S2D_MIN_RES = 10**9
S2D_MAX_CH = 64

# s2d-resident fast tail for the FINAL synthesis block (stylegan2_fast.py):
# unlike the isolated s2d conv above, the whole block stays in s2d form with
# one depth-to-space at the end, so the relayout cost is paid once.
FAST_TAIL = True
FAST_TAIL_MAX_CH = 64
FAST_TAIL_MIN_RES = 512
# Pallas pair-lane fused styled conv for thin-channel high-res layers
# (ops/pair_conv.py). Forward-only. Measured round 3, 1024px edit pipeline:
# 101.2 vs 138.3 img/s END-TO-END (standalone microbench was ~even at 27 vs
# 28.5 ms — in-graph, XLA fuses the pad into the upstream epilogue and its
# conv fusion wins). Kept parity-tested, OFF — same verdict class as
# FAST_CHAIN / STEM_POOL_S2D4 / S2D_MIN_RES.
PAIR_CONV = False
# FAST_CHAIN=True runs EVERY trailing block s2d-resident (the 512-res block
# included, via up_modconv_s2d_in — zero handoffs). Measured SLOWER at 1024px
# (79 vs 129 img/s): the s2d-input up-conv's phase kernel carries 4x nominal
# FLOPs, and at 512-res the plain path already runs ~41 TF/s, so the extra
# FLOPs lose more than full MXU lanes win. Kept (parity-tested) for
# lower-clock parts where the tradeoff may flip; default = final block only.
FAST_CHAIN = False


# ---------------------------------------------------------------------------
# spatial partitioning (sp) hook
# ---------------------------------------------------------------------------
#
# parallel/spatial.py installs a callable (models/hooks.py — shared by every
# generator family) that applies an H-axis jax.lax.with_sharding_constraint
# to synthesis activations once they are tall enough to split over the
# mesh's 'spatial' axis. GSPMD then partitions every conv spatially,
# inserting the 3x3 halo exchanges (collective-permute over ICI) itself —
# the TPU-native route to multi-chip speedup at the B=1..2 batch sizes
# vis/eval use, where data parallelism has nothing to shard. When no hint
# is installed both hooks are identity (zero overhead).
from .hooks import (  # noqa: F401 — re-exported; editor keys caches on it
    spatial_boundary as _spatial_boundary,
    spatial_constrain as _spatial_constrain,
    spatial_token,
)


def _space_to_depth(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)


def _s2d_kernel(w):
    """[3,3,Cin,Cout] -> [2,2,4Cin,4Cout] block-conv kernel.

    With the input pre-padded by 1 (top-left) before space-to-depth, output
    pixel (2m+py, 2n+px) reads padded rows 2m+py+dy+1 = blocks m+dy_blk with
    dy_blk in {0,1}: dy = 2*dy_blk + ry - py - 1, zero where |dy| > 1.
    """
    cin, cout = w.shape[2], w.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, cin, 2, 2, cout), w.dtype)
    for dby in range(2):
        for ry in range(2):
            for py in range(2):
                dy = 2 * dby + ry - py - 1
                if not -1 <= dy <= 1:
                    continue
                for dbx in range(2):
                    for rx in range(2):
                        for px in range(2):
                            dx = 2 * dbx + rx - px - 1
                            if not -1 <= dx <= 1:
                                continue
                            k2 = k2.at[dby, dbx, ry, rx, :, py, px, :].set(
                                w[dy + 1, dx + 1]
                            )
    # (ry, rx, ci) -> input channel block; (py, px, co) -> output block —
    # matching _space_to_depth's (2, 2, C) channel ordering.
    return k2.reshape(2, 2, 4 * cin, 4 * cout)


def _conv3x3_s2d(x, w):
    """3x3 same-pad conv via the space-to-depth equivalence (even H, W)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x2 = _space_to_depth(xp)  # [(H+2)/2, (W+2)/2, 4C]
    k2 = _s2d_kernel(w)
    y2 = lax.conv_general_dilated(
        x2,
        k2,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return _depth_to_space(y2)


# ---------------------------------------------------------------------------
# generator blocks
# ---------------------------------------------------------------------------


def init_styled_conv(key, in_ch, out_ch, k, style_dim, upsample=False):
    kc, _ = jax.random.split(key)
    return {
        "conv": init_modulated_conv(kc, in_ch, out_ch, k, style_dim),
        "noise_w": jnp.zeros((), jnp.float32),
        "act_b": jnp.zeros((out_ch,), jnp.float32),
    }


def styled_conv(p, x, style, noise, upsample=False, impl=None):
    k = p["conv"]["w"].shape[0]
    if (
        PAIR_CONV
        and not upsample
        and noise is not None
        and pair_conv.pair_conv_supported(x.shape, k, False, False)
    ):
        return _styled_conv_pair(p, x, style, noise)
    out = modulated_conv2d(p["conv"], x, style, up=upsample, impl=impl)
    if noise is not None:
        out = out + p["noise_w"].astype(out.dtype) * noise.astype(out.dtype)
    return fused_act.fused_leaky_relu(out, p["act_b"], impl=impl)


def _styled_conv_pair(p, x, style, noise):
    """Pallas pair-lane fused styled conv (ops/pair_conv.py): modulation and
    demod fold into per-batch weight blocks, noise/bias/lrelu fuse into the
    accumulator epilogue. Value-parity with the XLA path is pinned in
    tests/test_pair_conv.py. Forward-only (inference)."""
    pc = p["conv"]
    k, _, in_ch, out_ch = pc["w"].shape
    scale = 1.0 / math.sqrt(in_ch * k * k)
    s = equal_linear(pc["mod"], style)  # [B, Cin]
    w_sq = jnp.sum(jnp.square(pc["w"]), axis=(0, 1))  # [Cin, Cout]
    sigma = (scale * scale) * (jnp.square(s) @ w_sq)
    demod = lax.rsqrt(sigma + 1e-8)  # [B, Cout]
    if noise.shape[1] != x.shape[1]:  # defensive: resolution must match
        raise ValueError((noise.shape, x.shape))
    return pair_conv.fused_styled_conv3x3_pair(
        x, (pc["w"] * scale).astype(x.dtype), s.astype(x.dtype),
        demod.astype(x.dtype), noise, p["noise_w"], p["act_b"],
    )


def init_to_rgb(key, in_ch, style_dim):
    return {
        "conv": init_modulated_conv(key, in_ch, 3, 1, style_dim, demodulate=False),
        "b": jnp.zeros((3,), jnp.float32),
    }


def to_rgb(p, x, style, skip=None, impl=None):
    out = modulated_conv2d(p["conv"], x, style, demodulate=False, impl=impl)
    out = out + p["b"].astype(out.dtype)
    if skip is not None:
        if impl is None and skip.shape[1] >= SKIP_SHIFT_MIN_RES:
            # 3-channel depthwise upfirdn fills 2% of the MXU lanes and XLA
            # picks a transposed layout for it (profiled 2.2 ms each at
            # 512px); the polyphase shift form is pure VPU elementwise.
            from . import stylegan2_fast as fast

            skip = fast.depth_to_space(fast.upsample_skip_s2d(skip))
        else:
            blur = ufd.make_kernel(list(BLUR_KERNEL))
            skip = ufd.upsample2d(skip, blur, impl=impl)
        out = out + skip
    return out


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


def n_latent(size: int) -> int:
    return int(math.log2(size)) * 2 - 2


def num_noise_layers(size: int) -> int:
    return (int(math.log2(size)) - 2) * 2 + 1


def noise_shapes(size: int) -> list[tuple[int, int]]:
    shapes = []
    for i in range(num_noise_layers(size)):
        res = 2 ** ((i + 5) // 2)
        shapes.append((res, res))
    return shapes


def init_generator(
    key,
    size: int,
    style_dim: int = 512,
    n_mlp: int = 8,
    channel_multiplier: int = 2,
    channels: dict[int, int] | None = None,
) -> Params:
    channels = channels or channel_table(channel_multiplier)
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    style = [
        init_equal_linear(next(ki), style_dim, style_dim, lr_mul=0.01)
        for _ in range(n_mlp)
    ]

    log_size = int(math.log2(size))
    params: Params = {
        "style": style,
        "const": jax.random.normal(next(ki), (1, 4, 4, channels[4]), jnp.float32),
        "conv1": init_styled_conv(next(ki), channels[4], channels[4], 3, style_dim),
        "to_rgb1": init_to_rgb(next(ki), channels[4], style_dim),
        "convs": [],
        "to_rgbs": [],
        "noises": [
            jax.random.normal(next(ki), (1, h, w, 1), jnp.float32)
            for (h, w) in noise_shapes(size)
        ],
    }
    in_ch = channels[4]
    for i in range(3, log_size + 1):
        out_ch = channels[2**i]
        params["convs"].append(
            init_styled_conv(next(ki), in_ch, out_ch, 3, style_dim, upsample=True)
        )
        params["convs"].append(init_styled_conv(next(ki), out_ch, out_ch, 3, style_dim))
        params["to_rgbs"].append(init_to_rgb(next(ki), out_ch, style_dim))
        in_ch = out_ch
    return params


def style_forward(params: Params, z, lr_mul: float = 0.01, impl=None):
    """The 8-layer mapping network z -> w (networks.py:374-382)."""
    x = pixel_norm(z)
    for p in params["style"]:
        x = equal_linear(p, x, lr_mul=lr_mul, activation=True, impl=impl)
    return x


def mean_latent(params: Params, key, n: int = 4096):
    z = jax.random.normal(key, (n, params["style"][0]["w"].shape[0]), jnp.float32)
    return jnp.mean(style_forward(params, z), axis=0, keepdims=True)


def make_noise(params: Params, key, batch: int, size: int, per_sample=True):
    """Fresh per-layer noise, matching randomize_noise=True semantics."""
    keys = jax.random.split(key, num_noise_layers(size))
    b = batch if per_sample else 1
    return [
        jax.random.normal(k, (b, h, w, 1), jnp.float32)
        for k, (h, w) in zip(keys, noise_shapes(size))
    ]


def synthesize(
    params: Params,
    latent,
    noise=None,
    impl=None,
    dtype=jnp.float32,
    block_remat: bool = False,
):
    """Synthesis network: latent [B, n_latent, style_dim] -> image NHWC.

    noise: None -> use the fixed per-model noise buffers (randomize_noise=False
    semantics); or a list of [B|1, h, w, 1] arrays (injectable for parity
    tests, networks.py:476-483).

    block_remat: jax.checkpoint each synthesis block (and the s2d fast-tail
    chain) individually. Values and gradients are exact; during the backward
    only ONE block's intra-block activations are live at a time (plus the
    block-boundary x/skip saved as checkpoint inputs) instead of every
    residual of the whole forward at once — a strictly lower peak than
    wrapping the entire synthesize in one jax.checkpoint, for the same +1
    recomputed forward. Train-step plumbing: --remat_g block.
    """
    if noise is None:
        noise = params["noises"]
    latent = latent.astype(dtype)

    x = jnp.tile(params["const"].astype(dtype), (latent.shape[0], 1, 1, 1))
    x = styled_conv(params["conv1"], x, latent[:, 0], noise[0], impl=impl)
    skip = to_rgb(params["to_rgb1"], x, latent[:, 1], impl=impl)

    def _block(bp, x, skip, lat3, n_a, n_b):
        conv_up, conv, trgb = bp
        x = styled_conv(conv_up, x, lat3[:, 0], n_a, upsample=True, impl=impl)
        x = _spatial_constrain(x)
        x = styled_conv(conv, x, lat3[:, 1], n_b, impl=impl)
        x = _spatial_constrain(x)
        skip = to_rgb(trgb, x, lat3[:, 2], skip, impl=impl)
        return x, skip

    run_block = jax.checkpoint(_block) if block_remat else _block

    i = 1
    n_blocks = len(params["convs"]) // 2
    for idx in range(0, len(params["convs"]), 2):
        out_ch = params["convs"][idx]["conv"]["w"].shape[3]
        is_last = idx // 2 == n_blocks - 1
        fast_ok = (
            FAST_TAIL
            and out_ch <= FAST_TAIL_MAX_CH
            and x.shape[1] * 2 >= FAST_TAIL_MIN_RES
            and (FAST_CHAIN or is_last)
        )
        if fast_ok:
            # s2d-resident fast tail (stylegan2_fast.py): once the channel
            # count drops to MXU-starving widths at high resolution, EVERY
            # remaining block runs s2d-resident — later blocks consume s2d
            # directly (up_modconv_s2d_in), so the only depth-to-space is the
            # final rgb. (Channels shrink and resolution grows monotonically,
            # so fast_ok holds for the whole trailing run.)
            from . import stylegan2_fast as fast

            blocks = [
                (params["convs"][j], params["convs"][j + 1],
                 params["to_rgbs"][j // 2])
                for j in range(idx, len(params["convs"]), 2)
            ]

            def _chain(blocks, x, skip, lats, ns):
                return fast.chain_blocks_s2d(blocks, x, skip, lats, ns,
                                             impl=impl)

            run_chain = jax.checkpoint(_chain) if block_remat else _chain
            skip = run_chain(blocks, x, skip, latent[:, i:], noise[idx + 1:])
            break
        x, skip = run_block(
            (params["convs"][idx], params["convs"][idx + 1],
             params["to_rgbs"][idx // 2]),
            x, skip, latent[:, i:i + 3], noise[idx + 1], noise[idx + 2],
        )
        i += 2
    # Spatial partitioning stops at the generator boundary: the rgb output
    # re-constrains to batch-only sharding so consumer towers (R/VGG/D, whose
    # late stages collapse H below the mesh axis) never inherit an
    # over-sharded spatial dim — the partitioner mis-transposes stride-2 conv
    # VJPs once shards outnumber rows (measured: grads 70x off at H=1..2 on a
    # 4-way axis, forward exact; tests/test_spatial.py).
    return _spatial_boundary(skip.astype(jnp.float32))


def generator_forward(
    params: Params,
    styles,
    input_is_latent: bool = False,
    truncation: float = 1.0,
    truncation_latent=None,
    noise=None,
    key=None,
    size: int | None = None,
    impl=None,
    dtype=jnp.float32,
    block_remat: bool = False,
):
    """Full G forward (networks.py:460-514). styles: [B, style_dim] z (mapped
    through the style MLP and broadcast over all layers) or [B, n_latent,
    style_dim] when input_is_latent."""
    if not input_is_latent:
        w = style_forward(params, styles, impl=impl)
        nl = 2 * len(params["to_rgbs"]) + 2
        latent = jnp.repeat(w[:, None, :], nl, axis=1)
    else:
        latent = styles
    if truncation < 1.0:
        latent = truncation_latent + truncation * (latent - truncation_latent)
    if noise is None and key is not None:
        sz = size or 4 * 2 ** len(params["to_rgbs"])
        noise = make_noise(params, key, latent.shape[0], sz)
    return synthesize(params, latent, noise=noise, impl=impl, dtype=dtype,
                      block_remat=block_remat)


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


def init_conv_layer(key, in_ch, out_ch, k, downsample=False, bias=True, activate=True):
    p = {"conv": init_equal_conv(key, in_ch, out_ch, k, bias=bias and not activate)}
    if activate and bias:
        p["act_b"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def conv_layer(p, x, downsample=False, activate=True, impl=None):
    k = p["conv"]["w"].shape[0]
    if downsample:
        blur = ufd.make_kernel(list(BLUR_KERNEL))
        p_ = (len(BLUR_KERNEL) - 2) + (k - 1)
        x = ufd.blur2d(x, blur, pad=((p_ + 1) // 2, p_ // 2), impl=impl)
        out = equal_conv2d(p["conv"], x, stride=2, padding=0)
    else:
        out = equal_conv2d(p["conv"], x, stride=1, padding=k // 2)
    if activate:
        if "act_b" in p:
            out = fused_act.fused_leaky_relu(out, p["act_b"], impl=impl)
        else:
            out = fused_act.fused_leaky_relu(out, None, impl=impl)
    return out


def init_res_block(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": init_conv_layer(k1, in_ch, in_ch, 3),
        "conv2": init_conv_layer(k2, in_ch, out_ch, 3, downsample=True),
        "skip": init_conv_layer(k3, in_ch, out_ch, 1, downsample=True, bias=False, activate=False),
    }


def res_block(p, x, impl=None):
    out = conv_layer(p["conv1"], x, impl=impl)
    out = conv_layer(p["conv2"], out, downsample=True, impl=impl)
    skip = conv_layer(p["skip"], x, downsample=True, activate=False, impl=impl)
    return (out + skip) / math.sqrt(2)


def init_discriminator(
    key, size: int, channel_multiplier: int = 2, channels: dict[int, int] | None = None
) -> Params:
    channels = channels or channel_table(channel_multiplier)
    keys = jax.random.split(key, 32)
    ki = iter(keys)
    log_size = int(math.log2(size))

    params: Params = {
        "from_rgb": init_conv_layer(next(ki), 3, channels[size], 1),
        "blocks": [],
    }
    in_ch = channels[size]
    for i in range(log_size, 2, -1):
        out_ch = channels[2 ** (i - 1)]
        params["blocks"].append(init_res_block(next(ki), in_ch, out_ch))
        in_ch = out_ch
    params["final_conv"] = init_conv_layer(next(ki), in_ch + 1, channels[4], 3)
    params["final_lin1"] = init_equal_linear(next(ki), channels[4] * 16, channels[4])
    params["final_lin2"] = init_equal_linear(next(ki), channels[4], 1)
    return params


def minibatch_stddev(x, group_size=4, feat=1):
    """Minibatch stddev channel (networks.py:630-638), NHWC.

    The reference's `view(group, -1, ...)` requires batch % group == 0 and
    errors otherwise (so it can only ever run at divisible batches); here g
    falls back to the largest divisor of b that is <= group_size, which is
    bit-identical wherever the reference runs and merely defined where it
    crashes (e.g. the 1024px B=10 training probe). Degenerate case: a PRIME
    b > group_size reaches g=1, where the stddev channel is the constant
    sqrt(1e-8) — the feature is effectively off; warned once below."""
    b, h, w, c = x.shape
    assert b > 0, "minibatch_stddev requires a non-empty batch"
    g = min(b, group_size)
    while b % g:
        g -= 1
    if g == 1 and b > 1 and not getattr(minibatch_stddev, "_warned_g1", False):
        minibatch_stddev._warned_g1 = True
        import logging

        logging.getLogger(__name__).warning(
            "minibatch_stddev: batch %d has no divisor <= group_size %d; "
            "group=1 makes the stddev channel constant (feature disabled). "
            "Prefer a batch divisible by the group size.", b, group_size
        )
    y = x.reshape(g, b // g, h, w, feat, c // feat)
    var = jnp.var(y, axis=0)
    std = jnp.sqrt(var + 1e-8)
    stat = jnp.mean(std, axis=(1, 2, 3, 4), keepdims=False)  # [B/g]
    stat = stat.reshape(b // g, 1, 1, 1)
    stat = jnp.tile(stat, (g, h, w, 1))
    return jnp.concatenate([x, stat.astype(x.dtype)], axis=-1)


def discriminator_forward(params: Params, img, impl=None, dtype=jnp.float32):
    x = img.astype(dtype)
    x = conv_layer(params["from_rgb"], x, impl=impl)
    for blk in params["blocks"]:
        x = res_block(blk, x, impl=impl)
    x = minibatch_stddev(x)
    x = conv_layer(params["final_conv"], x, impl=impl)
    # NHWC flatten order (h, w, c) differs from the reference's NCHW (c, h, w);
    # the torch checkpoint converter permutes final_lin1's input rows to match.
    x = x.reshape(x.shape[0], -1)
    x = equal_linear(params["final_lin1"], x, activation=True, impl=impl)
    x = equal_linear(params["final_lin2"], x)
    return x.astype(jnp.float32)
