"""Space-to-depth-resident fast tail for StyleGAN2 synthesis.

The top-resolution block dominates 1024px synthesis (~28 ms of a 39 ms
forward, profiled): its channel counts (32-64) fill a quarter of the MXU's
128 lanes, and fixing individual convs with space-to-depth loses the win to
boundary relayouts. This module keeps the ENTIRE final block resident in
s2d form — activations live as [B, H/2, W/2, 4C] with channel order
(phase_y, phase_x, c) — so there is exactly one depth-to-space at the end:

  * ``up_modconv_s2d``   — modulated conv-transpose(stride 2, k=3) + the
    following blur FUSED into one conv whose outputs ARE the s2d phases
    (the composed 6-tap transposed kernel's polyphase decomposition:
    y[2m+q] = sum_d G[2d+q] x[m-d], 3 taps per phase).
  * ``modconv3x3_s2d``   — 3x3 modulated conv entirely in s2d (the pre-pad
    trick re-expressed as a phase-shifted channel remap on the block grid).
  * ``to_rgb_s2d``       — 1x1 modulated conv as a block-diagonal 4C -> 12.
  * ``upsample_skip_s2d``— the ToRGB skip's x2 FIR upsample emitted directly
    as phases on the half-res grid (2 taps per phase).

Every piece is parity-tested against the standard path
(tests/test_fast_tail.py); `synthesize` dispatches here for the final block
when the output resolution is large and channels are narrow.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops import fused_act
from . import stylegan2 as sg2

# OFF: the input-phase split (fewer padded-zero FLOPs) measured SLOWER
# end-to-end (122 vs 129 img/s) — the lane-dim channel slices relayout.
USE_SPLIT_CONV = False

BLUR = np.asarray(sg2.ufd.make_kernel(list(sg2.BLUR_KERNEL)), np.float64)


# ---------------------------------------------------------------------------
# kernel composition helpers (host/trace-time, folded by XLA)
# ---------------------------------------------------------------------------


def compose_up_phase_kernel(w):
    """w [3,3,Cin,Cout] (transposed-conv weights, HWIO) -> phase kernel
    [3,3,Cin,4Cout] producing the s2d form of blur(convT(x, w)).

    Derivation (1-D): z = convT(x, stride 2, k=3, pad 0); y = blur(z,
    pad (1,1), kernel 4 taps scaled x4). y[p] = sum_i kf[i] z[p+i-1] and
    z[o] = sum_j x[j] w[o-2j] gives y[p] = sum_j x[j] G[p-2j] with
    G[s] = sum_i kf[i] w[s+i-1], s in [-2, 3]. Phase q = p mod 2:
    y[2m+q] = sum_{d in -1..1} G[2d+q] x[m-d].
    """
    # flipped taps; the up path's blur scales its kernel by factor**2 = 4
    kf = BLUR[::-1, ::-1] * 4.0
    cin, cout = w.shape[2], w.shape[3]

    # G2[sy, sx] = sum_{iy, ix} kf[iy, ix] * w[sy+iy-1, sx+ix-1]
    g2 = {}
    for sy in range(-2, 4):
        for sx in range(-2, 4):
            acc = None
            for iy in range(4):
                wy = sy + iy - 1
                if not 0 <= wy <= 2:
                    continue
                for ix in range(4):
                    wx = sx + ix - 1
                    if not 0 <= wx <= 2:
                        continue
                    term = float(kf[iy, ix]) * w[wy, wx]
                    acc = term if acc is None else acc + term
            if acc is not None:
                g2[(sy, sx)] = acc

    zeros = jnp.zeros((cin, cout), w.dtype)
    # K[idx_y, idx_x, ci, (qy, qx, co)] with idx = 1 - d (lax correlation,
    # pad 1): out[m] = sum_idx K[idx] x[m + idx - 1] == sum_d G[2d+q] x[m-d].
    rows = []
    for idx_y in range(3):
        cols = []
        dy = 1 - idx_y
        for idx_x in range(3):
            dx = 1 - idx_x
            phases = []
            for qy in range(2):
                for qx in range(2):
                    phases.append(g2.get((2 * dy + qy, 2 * dx + qx), zeros))
            cols.append(jnp.concatenate(phases, axis=-1))  # [Cin, 4Cout]
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)  # [3, 3, Cin, 4Cout]


# ---------------------------------------------------------------------------
# s2d-resident modulated ops
# ---------------------------------------------------------------------------


def _mod_demod(p, style, k):
    cin = p["w"].shape[2]
    scale = 1.0 / math.sqrt(cin * k * k)
    s = sg2.equal_linear(p["mod"], style)  # [B, Cin]
    w_sq = jnp.sum(jnp.square(p["w"]), axis=(0, 1))
    demod = lax.rsqrt((scale * scale) * (jnp.square(s) @ w_sq) + 1e-8)
    return s, demod, scale


def up_modconv_s2d(p, x, style):
    """Modulated convT(stride2,k3)+blur, emitting s2d phases.

    x: [B, H, W, Cin] -> [B, H, W, 4Cout] (s2d of the 2H x 2W result).
    """
    s, demod, scale = _mod_demod(p, style, 3)
    xs = x * s[:, None, None, :].astype(x.dtype)
    k = compose_up_phase_kernel((p["w"] * scale))
    out = lax.conv_general_dilated(
        xs, k.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    cout = p["w"].shape[3]
    return out * jnp.tile(demod, (1, 4))[:, None, None, :].astype(out.dtype)


def s2d_conv_kernel3(w):
    """[3,3,Cin,Cout] -> [3,3,4Cin,4Cout] same-pad block kernel (no input
    phase shifting needed — profiled relayouts of the pad-trick variant cost
    more than the kernel's 4x nominal FLOPs, which run at full MXU width).

    y[2m+py] = sum_dy K[dy+1] x[2m+py+dy]; u = py+dy spans blocks
    m-1..m+1: dy = 2(db-1) + ry - py, zero where |dy| > 1.
    """
    cin, cout = w.shape[2], w.shape[3]
    k3 = jnp.zeros((3, 3, 2, 2, cin, 2, 2, cout), w.dtype)
    for dby in range(3):
        for ry in range(2):
            for py in range(2):
                dy = 2 * (dby - 1) + ry - py
                if not -1 <= dy <= 1:
                    continue
                for dbx in range(3):
                    for rx in range(2):
                        for px in range(2):
                            dx = 2 * (dbx - 1) + rx - px
                            if not -1 <= dx <= 1:
                                continue
                            k3 = k3.at[dby, dbx, ry, rx, :, py, px, :].set(
                                w[dy + 1, dx + 1]
                            )
    return k3.reshape(3, 3, 4 * cin, 4 * cout)


def _split_kernels(w):
    """K3 split by input y-phase: two [2,3,2Cin,4Cout] kernels (windows
    {m,m+1} / {m-1,m} on the block grid), halving the zero padding that the
    single 3x3 block kernel carries. dy = 2*d' - py (ry=0) and
    dy = 2(d'-1) + 1 - py (ry=1); x stays the 3-window with rx folded in."""
    cin, cout = w.shape[2], w.shape[3]
    ks = []
    for ry in range(2):
        k = jnp.zeros((2, 3, 2, cin, 2, 2, cout), w.dtype)  # [dy', dx, rx, ci, py, px, co]
        for dyp in range(2):
            for py in range(2):
                dy = 2 * dyp - py if ry == 0 else 2 * (dyp - 1) + 1 - py
                if not -1 <= dy <= 1:
                    continue
                for dbx in range(3):
                    for rx in range(2):
                        for px in range(2):
                            dx = 2 * (dbx - 1) + rx - px
                            if not -1 <= dx <= 1:
                                continue
                            k = k.at[dyp, dbx, rx, :, py, px, :].set(
                                w[dy + 1, dx + 1]
                            )
        ks.append(k.reshape(2, 3, 2 * cin, 4 * cout))
    return ks


def modconv3x3_s2d_split(p, x2, style):
    """modconv3x3_s2d via the input-phase split (fewer padded-zero FLOPs)."""
    s, demod, scale = _mod_demod(p, style, 3)
    cin = p["w"].shape[2]
    xs = x2 * jnp.tile(s, (1, 4))[:, None, None, :].astype(x2.dtype)
    k0, k1 = _split_kernels(p["w"] * scale)
    x_ry0 = xs[..., : 2 * cin]
    x_ry1 = xs[..., 2 * cin :]
    dn = ("NHWC", "HWIO", "NHWC")
    out = lax.conv_general_dilated(
        x_ry0, k0.astype(x2.dtype), (1, 1), ((0, 1), (1, 1)),
        dimension_numbers=dn,
    ) + lax.conv_general_dilated(
        x_ry1, k1.astype(x2.dtype), (1, 1), ((1, 0), (1, 1)),
        dimension_numbers=dn,
    )
    return out * jnp.tile(demod, (1, 4))[:, None, None, :].astype(out.dtype)


def modconv3x3_s2d(p, x2, style):
    """3x3 modulated conv, s2d in -> s2d out (zero relayouts)."""
    s, demod, scale = _mod_demod(p, style, 3)
    xs = x2 * jnp.tile(s, (1, 4))[:, None, None, :].astype(x2.dtype)
    k3 = s2d_conv_kernel3(p["w"] * scale)
    out = lax.conv_general_dilated(
        xs,
        k3.astype(x2.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out * jnp.tile(demod, (1, 4))[:, None, None, :].astype(out.dtype)


def to_rgb_s2d(p, x2, style):
    """1x1 modulated conv (no demod) as a block-diagonal 4C -> 12 conv
    (conv form rather than reshape-matmul: the reshape forced a layout
    copy of the full-res activation)."""
    cin = p["conv"]["w"].shape[2]
    scale = 1.0 / math.sqrt(cin)
    s = sg2.equal_linear(p["conv"]["mod"], style)
    xs = x2 * jnp.tile(s, (1, 4))[:, None, None, :].astype(x2.dtype)
    w = p["conv"]["w"][0, 0] * scale  # [Cin, 3]
    blocks = jnp.zeros((4 * cin, 12), w.dtype)
    for q in range(4):
        blocks = blocks.at[q * cin : (q + 1) * cin, q * 3 : (q + 1) * 3].set(w)
    y = lax.conv_general_dilated(
        xs,
        blocks[None, None].astype(xs.dtype),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + jnp.tile(p["b"], 4).astype(y.dtype)


def upsample_skip_s2d(skip):
    """x2 FIR upsample of the skip image, emitted as s2d phases.

    upsample2d uses kernel*4, up 2, pad (2, 1): y[p] = sum_i kf[i] z[p+i-2]
    over even (p+i-2); phase q: 2 taps. 1-D taps (x2 gain per axis):
      q=0: j=m-1, m with weights kf[0], kf[2]
      q=1: j=m,  m+1 with weights kf[1], kf[3]
    where kf = flip([1,3,3,1]/8 * 2).
    """
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0])
    k1 = k1 / k1.sum() * 2.0
    # python-float taps: numpy f64 scalars would promote bf16 skips to f32
    kf = [float(v) for v in k1[::-1]]

    def axis_up(a, axis):
        def sh(arr, off):
            # arr shifted so result[m] = arr[m + off], zero-padded
            pad = [(0, 0)] * arr.ndim
            if off >= 0:
                pad[axis] = (0, off)
                sl = [slice(None)] * arr.ndim
                sl[axis] = slice(off, off + arr.shape[axis])
            else:
                pad[axis] = (-off, 0)
                sl = [slice(None)] * arr.ndim
                sl[axis] = slice(0, arr.shape[axis])
            return jnp.pad(arr, pad)[tuple(sl)]

        q0 = kf[0] * sh(a, -1) + kf[2] * a
        q1 = kf[1] * a + kf[3] * sh(a, +1)
        return jnp.stack([q0, q1], axis=axis + 1)

    b, h, w, c = skip.shape
    v = axis_up(skip, 1)                # [B, H, 2, W, C]
    hh = axis_up(v, 3)                  # [B, H, 2, W, 2, C]
    return hh.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, 4 * c)


def depth_to_space(x2):
    return sg2._depth_to_space(x2)


def noise_to_s2d(noise):
    """[B, 2H, 2W, 1] noise -> per-phase [B, H, W, 4] (broadcast over C by
    the caller via repeat)."""
    return sg2._space_to_depth(noise)


# ---------------------------------------------------------------------------
# the fast final block
# ---------------------------------------------------------------------------


def block_s2d(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up, lat_conv,
              lat_rgb, noise_up, noise_conv, impl=None):
    """A full non-final block in s2d form, handing back normal-form
    (x, skip) for the next block (two cheap depth-to-space relayouts)."""
    cout = conv_up_p["conv"]["w"].shape[3]

    out2 = up_modconv_s2d(conv_up_p["conv"], x, lat_up)
    if noise_up is not None:
        n2 = jnp.repeat(noise_to_s2d(noise_up.astype(out2.dtype)), cout, axis=-1)
        out2 = out2 + conv_up_p["noise_w"].astype(out2.dtype) * n2
    out2 = fused_act.fused_leaky_relu(
        out2, jnp.tile(conv_up_p["act_b"], 4), impl=impl
    )

    out2 = modconv3x3_s2d(conv_p["conv"], out2, lat_conv)
    if noise_conv is not None:
        n2 = jnp.repeat(noise_to_s2d(noise_conv.astype(out2.dtype)), cout, axis=-1)
        out2 = out2 + conv_p["noise_w"].astype(out2.dtype) * n2
    out2 = fused_act.fused_leaky_relu(out2, jnp.tile(conv_p["act_b"], 4), impl=impl)

    rgb2 = to_rgb_s2d(to_rgb_p, out2, lat_rgb)
    rgb2 = rgb2 + upsample_skip_s2d(skip).astype(rgb2.dtype)
    return depth_to_space(out2), depth_to_space(rgb2)


def final_block_s2d(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up, lat_conv,
                    lat_rgb, noise_up, noise_conv, impl=None):
    """conv_up -> noise/act -> conv -> noise/act -> to_rgb(+skip), all s2d.

    x: [B, H, W, Cin] (previous resolution); skip: [B, H, W, 3].
    noises: [B|1, 2H, 2W, 1]. Returns the 2H x 2W rgb image.
    """
    cout = conv_up_p["conv"]["w"].shape[3]

    out2 = up_modconv_s2d(conv_up_p["conv"], x, lat_up)
    if noise_up is not None:
        n2 = jnp.repeat(noise_to_s2d(noise_up.astype(out2.dtype)), cout, axis=-1)
        out2 = out2 + conv_up_p["noise_w"].astype(out2.dtype) * n2
    out2 = fused_act.fused_leaky_relu(
        out2, jnp.tile(conv_up_p["act_b"], 4), impl=impl
    )

    conv_fn = modconv3x3_s2d_split if USE_SPLIT_CONV else modconv3x3_s2d
    out2 = conv_fn(conv_p["conv"], out2, lat_conv)
    if noise_conv is not None:
        n2 = jnp.repeat(noise_to_s2d(noise_conv.astype(out2.dtype)), cout, axis=-1)
        out2 = out2 + conv_p["noise_w"].astype(out2.dtype) * n2
    out2 = fused_act.fused_leaky_relu(out2, jnp.tile(conv_p["act_b"], 4), impl=impl)

    rgb2 = to_rgb_s2d(to_rgb_p, out2, lat_rgb)
    rgb2 = rgb2 + upsample_skip_s2d(skip).astype(rgb2.dtype)
    return depth_to_space(rgb2)
