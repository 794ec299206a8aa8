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


def compose_up_phase_kernel_s2d_in(w):
    """w [3,3,Cin,Cout] -> [3,3,4Cin,16Cout]: the s2d-INPUT form of the fused
    convT(stride2,k3)+blur, for chaining s2d blocks without depth-to-space.

    1-D derivation (NEXT.md item 1): x stored s2d over blocks b with phases
    r (x[2b+r]); output y[p] = sum_j x[j] G[p-2j] with the composed taps G
    (support [-2,3], see compose_up_phase_kernel). Writing p = 4c + 2s + q
    (c on the input block grid, s the next-level block phase, q the final
    phase): G-index = 4(c-b) + 2(s-r) + q, so a 3-tap conv over the block
    grid (d = c-b in {-1,0,1}) emitting QUAD phases (s,q) per axis — 16
    output phase channels in 2-D. `quad_to_s2d` relayouts the result to the
    s2d form of the doubled grid.
    """
    cin, cout = w.shape[2], w.shape[3]
    g2 = _compose_g2(w)  # [6, 6, Cin, Cout], G index -2..3 at offset +2

    # One constant-index GATHER builds the phase kernel (per-entry scatters
    # would execute ~576 device ops per forward — measured catastrophic).
    # Pad a zero plane at index 6 for out-of-support entries.
    g2z = jnp.concatenate([g2, jnp.zeros((1, 6, cin, cout), g2.dtype)], axis=0)
    g2z = jnp.concatenate(
        [g2z, jnp.zeros((7, 1, cin, cout), g2.dtype)], axis=1
    )  # [7, 7, Cin, Cout]

    def axis_idx():
        """[3(idx), 2(r), 2(s), 2(q)] -> g index (+2 offset), 6 = zero."""
        out = np.full((3, 2, 2, 2), 6, np.int32)
        for idx in range(3):
            d = 1 - idx
            for r in range(2):
                for s in range(2):
                    for q in range(2):
                        g = 4 * d + 2 * (s - r) + q
                        if -2 <= g <= 3:
                            out[idx, r, s, q] = g + 2
        return out

    ay = axis_idx()  # gy index by (idx_y, ry, sy, qy)
    # broadcast to the full [3,3,2,2,2,2,2,2] (idx_y,idx_x,ry,rx,sy,qy,sx,qx)
    iy = ay[:, None, :, None, :, :, None, None]
    ix = ay[None, :, None, :, None, None, :, :]
    iy, ix = np.broadcast_arrays(
        iy, ix
    )  # both [3,3,2,2,2,2,2,2]
    k = g2z[jnp.asarray(iy), jnp.asarray(ix)]  # [..., Cin, Cout]
    # -> [idx_y, idx_x, (ry, rx, ci), (sy, qy, sx, qx, co)]
    k = k.transpose(0, 1, 2, 3, 8, 4, 5, 6, 7, 9)
    return k.reshape(3, 3, 4 * cin, 16 * cout)


def _compose_g2(w):
    """Composed convT+blur taps G2[sy+2, sx+2, ci, co] = sum_{iy,ix}
    kf[iy,ix] w[sy+iy-1, sx+ix-1], s in [-2,3] -> a 6x6 grid, computed as one
    padded correlation (XLA folds it into the downstream conv)."""
    kf = jnp.asarray(BLUR[::-1, ::-1] * 4.0, w.dtype)  # [4, 4]
    wp = jnp.pad(w, ((3, 3), (3, 3), (0, 0), (0, 0)))
    # G2[s+2, t+2] = sum_{iy,ix} kf[iy,ix] wp[s+2+iy, t+2+ix]  (wp offset +3,
    # index s+iy-1+3 = (s+2)+iy)
    rows = []
    for sy in range(6):
        cols = []
        for sx in range(6):
            patch = wp[sy : sy + 4, sx : sx + 4]  # [4,4,ci,co]
            cols.append(jnp.einsum("ij,ijab->ab", kf, patch))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [6, 6, Cin, Cout]


def quad_to_s2d(out, cout):
    """[B, H, W, 16Cout] quad phases (sy,qy,sx,qx,co) -> s2d of the doubled
    grid: [B, 2H, 2W, 4Cout] with channel order (qy,qx,co)."""
    b, h, w, _ = out.shape
    x = out.reshape(b, h, w, 2, 2, 2, 2, cout)
    # [B, cy, sy, cx, sx, qy, qx, co]
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(b, 2 * h, 2 * w, 4 * cout)


def up_modconv_s2d_in(p, x2, style):
    """Modulated convT+blur with s2d INPUT and s2d output (chained blocks).

    x2: [B, H, W, 4Cin] (s2d of the 2H grid) -> [B, 2H, 2W, 4Cout]
    (s2d of the 4H grid)."""
    s, demod, scale = _mod_demod(p, style, 3)
    xs = x2 * jnp.tile(s, (1, 4))[:, None, None, :].astype(x2.dtype)
    k = compose_up_phase_kernel_s2d_in(p["w"] * scale)
    out = lax.conv_general_dilated(
        xs, k.astype(x2.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    cout = p["w"].shape[3]
    out2 = quad_to_s2d(out, cout)
    return out2 * jnp.tile(demod, (1, 4))[:, None, None, :].astype(out2.dtype)


def upsample_skip_s2d_in(skip2, channels=3):
    """x2 FIR upsample of an s2d-form skip, emitting the doubled grid's s2d.

    skip2: [B, H, W, 4C] (s2d of 2H) -> [B, 2H, 2W, 4C] (s2d of 4H).
    upfirdn(up 2, pad (2,1)) gives y[p] = sum_i kf[i] z[p+i-2] with z the
    zero-upsampled input (z[2j] = x[j]) and kf the flipped [1,3,3,1]/8 * 2
    taps — so x[j] carries weight kf[2j - p + 2]. With p = 4c + 2s + q and
    j = 2b + r: kf-index = -4d + 2(r-s) - q + 2, d = c-b in {-1, 0, 1} (d=1
    reaches only (r=1,s=0,q=0); d=-1 only (r=0,s=1,q=1)) — a 3-tap conv over
    the block grid, quad phases out.
    """
    k1 = np.asarray([1.0, 3.0, 3.0, 1.0])
    k1 = k1 / k1.sum() * 2.0
    u1 = [float(v) for v in k1[::-1]]  # kf
    c = channels

    def u(idx):
        return u1[idx] if 0 <= idx <= 3 else 0.0

    # out[c] = sum_idx K[idx] x[c + idx - 1]  (pad (1,1))  =>  d = 1 - idx
    taps = []
    for idx_y in range(3):
        dy = 1 - idx_y
        row = []
        for idx_x in range(3):
            dx = 1 - idx_x
            blk = np.zeros((2, 2, c, 2, 2, 2, 2, c), np.float64)
            for ry in range(2):
                for rx in range(2):
                    for sy in range(2):
                        for qy in range(2):
                            wy = u(-4 * dy + 2 * (ry - sy) - qy + 2)
                            if wy == 0.0:
                                continue
                            for sx in range(2):
                                for qx in range(2):
                                    wx = u(-4 * dx + 2 * (rx - sx) - qx + 2)
                                    if wx == 0.0:
                                        continue
                                    for ci in range(c):
                                        blk[ry, rx, ci, sy, qy, sx, qx, ci] = wy * wx
            row.append(blk.reshape(4 * c, 16 * c))
        taps.append(row)
    k = jnp.asarray(np.stack([np.stack(r) for r in taps]), skip2.dtype)

    out = lax.conv_general_dilated(
        skip2, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return quad_to_s2d(out, c)


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


def _block_s2d_core(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up, lat_conv,
                    lat_rgb, noise_up, noise_conv, impl=None,
                    s2d_input=False):
    """conv_up -> noise/act -> conv -> noise/act -> to_rgb(+skip), all s2d.

    s2d_input=False: x [B,H,W,Cin] / skip [B,H,W,3] in NORMAL form (the
    chain's entry block). s2d_input=True: x [B,H,W,4Cin] / skip [B,H,W,12]
    already s2d (chained block — zero relayouts on the way in).
    Returns (out2, rgb2) both in s2d form of the DOUBLED grid.
    noises: [B|1, 2H', 2W', 1] at the output resolution.
    """
    cout = conv_up_p["conv"]["w"].shape[3]

    if s2d_input:
        out2 = up_modconv_s2d_in(conv_up_p["conv"], x, lat_up)
    else:
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
    up_skip = upsample_skip_s2d_in(skip) if s2d_input else upsample_skip_s2d(skip)
    rgb2 = rgb2 + up_skip.astype(rgb2.dtype)
    return out2, rgb2


def block_s2d(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up, lat_conv,
              lat_rgb, noise_up, noise_conv, impl=None):
    """A full non-final block in s2d form, handing back normal-form
    (x, skip) for the next block (two cheap depth-to-space relayouts).
    Superseded by chain_blocks_s2d which skips the handoff entirely."""
    out2, rgb2 = _block_s2d_core(conv_up_p, conv_p, to_rgb_p, x, skip,
                                 lat_up, lat_conv, lat_rgb, noise_up,
                                 noise_conv, impl=impl)
    return depth_to_space(out2), depth_to_space(rgb2)


def final_block_s2d(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up, lat_conv,
                    lat_rgb, noise_up, noise_conv, impl=None):
    """x: [B, H, W, Cin] (previous resolution); skip: [B, H, W, 3].
    Returns the 2H x 2W rgb image."""
    _, rgb2 = _block_s2d_core(conv_up_p, conv_p, to_rgb_p, x, skip, lat_up,
                              lat_conv, lat_rgb, noise_up, noise_conv,
                              impl=impl)
    return depth_to_space(rgb2)


def chain_blocks_s2d(blocks, x, skip, latents, noises, impl=None):
    """Run a TRAILING run of synthesis blocks fully s2d-resident: the entry
    block lifts normal-form (x, skip) into s2d; every later block consumes
    and produces s2d (up_modconv_s2d_in / upsample_skip_s2d_in — NEXT.md
    item 1); one depth-to-space at the very end.

    blocks: [(conv_up_p, conv_p, to_rgb_p)] for the trailing run;
    latents: [B, 2*len(blocks)+1, D] slice aligned to the run's first layer;
    noises: flat list, two per block. Returns the final rgb (normal form).
    """
    rgb2 = None
    for bi, (cu, cv, tr) in enumerate(blocks):
        x, rgb2 = _block_s2d_core(
            cu, cv, tr, x, skip,
            latents[:, 2 * bi], latents[:, 2 * bi + 1], latents[:, 2 * bi + 2],
            noises[2 * bi], noises[2 * bi + 1],
            impl=impl, s2d_input=(bi > 0),
        )
        skip = rgb2
    return depth_to_space(rgb2)
