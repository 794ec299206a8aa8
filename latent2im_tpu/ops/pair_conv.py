"""Pallas fused 3x3 styled-conv for thin-channel high-resolution layers.

Motivation (measured, round 3): the 1024px edit pipeline's top op is the
512-res 64-channel conv2 (+its noise/bias/lrelu epilogue) at 15.8 ms per
B=32 call — 39 TF/s against a ~98 TF/s half-lane ceiling, because Cout=64
fills half the MXU lanes AND XLA's conv lowering streams an im2col-sized
A-matrix from HBM (the bare [M,576]@[576,64] GEMM measures the same
33 TF/s, bandwidth-bound).

This kernel attacks both limits at once:

  * PAIR-LANE LAYOUT: [B,H,W,64] is viewed as [B,H,W/2,128] (two adjacent
    pixels' channels packed into full 128 lanes — a free reshape, no
    transpose). The 3x3 conv becomes 9 accumulated [M,128]@[128,128]
    matmuls against block-structured weights (2x nominal FLOPs, but at
    full lanes the MXU doesn't care).
  * VMEM RESIDENCY: each input tile is DMA'd once and reused by all nine
    matmuls, so the A-matrix bandwidth amplification that bounds the XLA
    form disappears.
  * FULL EPILOGUE FUSION: the per-batch style modulation and demodulation
    fold into the per-batch weight blocks (conv(x*s, w)*d == conv(x, s*w*d)
    — the rosinality grouped-conv identity, networks.py:176-272), and
    noise + bias + LeakyReLU*sqrt(2) run on the accumulator tile before the
    single bf16 store.

Weight-block mapping: output pixel 2n+po reads input pixel 2(n+dpx)+pi when
dx = 2*dpx + pi - po is a valid tap in [-1, 1]; wblk[dy, dpx+1,
pi*C+ci, po*C+co] = w[dy, dx+1, ci, co], zero elsewhere.

Forward-only (inference editing path): no custom VJP — training keeps the
XLA formulation. Interpreter mode covers CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def build_pair_blocks(w):
    """[3,3,C,C] -> [3,3,2C,2C] pair-lane block weights (docstring mapping)."""
    C = w.shape[2]
    blk = jnp.zeros((3, 3, 2 * C, 2 * C), w.dtype)
    for dpx in (-1, 0, 1):
        for po in (0, 1):
            for pi in (0, 1):
                dx = 2 * dpx + pi - po
                if -1 <= dx <= 1:
                    blk = blk.at[
                        :, dpx + 1, pi * C : (pi + 1) * C, po * C : (po + 1) * C
                    ].set(w[:, dx + 1])
    return blk


def _kernel(x_hbm, wb_ref, noise_ref, bias_ref, o_ref, *, th, wp, n_h,
            lanes, slope, gain):
    hi = pl.program_id(0)
    bi = pl.program_id(1)

    def body(xs, sem):
        # xs rows: [row0-1, row0+th+1) of the image, edge rows zeroed.
        # The W-pair halo is NOT stored (sublane DMA offsets must be
        # 8-aligned): the +-1 pair shifts are in-register rolls + edge masks.
        row0 = hi * th

        @pl.when(hi == 0)
        def _():
            xs[0, :, :] = jnp.zeros((wp, lanes), xs.dtype)

        @pl.when(hi == n_h - 1)
        def _():
            xs[th + 1, :, :] = jnp.zeros((wp, lanes), xs.dtype)

        src_lo = jnp.maximum(row0 - 1, 0)
        src_hi = jnp.minimum(row0 + th + 1, n_h * th)
        n_rows = src_hi - src_lo  # th+2 interior, th+1 at either edge
        dst0 = jnp.where(hi == 0, 1, 0)
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(src_lo, th + 1), :, :],
            xs.at[pl.ds(dst0, th + 1), :, :],
            sem.at[0],
        )
        cp.start()
        # the (th+2)-row interior case needs one more row; issue a second
        # 1-row copy rather than a dynamic-size DMA
        @pl.when(n_rows == th + 2)
        def _():
            cp2 = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(src_lo + th + 1, 1), :, :],
                xs.at[pl.ds(th + 1, 1), :, :],
                sem.at[1],
            )
            cp2.start()
            cp2.wait()

        cp.wait()

        # One accumulator per pair-shift group; the +-1 pair shifts apply to
        # the f32 accumulators AFTER the matmuls (Mosaic supports 32-bit
        # rotates only, and the shift commutes with the linear map):
        #   out[n] += x[n-1] @ W_m1  ==  out = roll(x @ W_m1, +1) masked
        accs = [jnp.zeros((th * wp, lanes), jnp.float32) for _ in range(3)]
        for dy in range(3):
            a = xs[dy : dy + th, :, :].reshape(th * wp, lanes)
            for dpx in range(3):
                # HIGHEST: f32 inputs run bf16x6-class passes (parity with
                # XLA's bf16x3 f32 convs); bf16 inputs are exact either way
                accs[dpx] = accs[dpx] + jnp.dot(
                    a, wb_ref[0, dy, dpx],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
        col = jax.lax.broadcasted_iota(jnp.int32, (th, wp, lanes), 1)
        a_m1 = accs[0].reshape(th, wp, lanes)  # from pairs n-1
        a_0 = accs[1].reshape(th, wp, lanes)
        a_p1 = accs[2].reshape(th, wp, lanes)  # from pairs n+1
        out = (
            a_0
            + jnp.where(col == 0, 0.0, pltpu.roll(a_m1, 1, 1))
            + jnp.where(col == wp - 1, 0.0, pltpu.roll(a_p1, wp - 1, 1))
        )
        out = out + noise_ref[0].astype(jnp.float32)
        out = out + bias_ref[0][None, None, :].astype(jnp.float32)
        out = jnp.where(out >= 0, out, out * slope) * gain
        o_ref[0] = out.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((th + 2, wp, lanes), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


def fused_styled_conv3x3_pair(
    x, w, s_in, d_out, noise, noise_w, act_b,
    slope: float = 0.2, gain: float = 2 ** 0.5, th: int | None = None,
):
    """Fused styled conv: lrelu(conv(x*s_in, w)*d_out + noise_w*noise + b)*gain.

    x [B,H,W,C] (C=64-class, W even), w [3,3,C,C] pre-scaled (1/sqrt(fan)),
    s_in [B,C] modulation scales, d_out [B,C] demod scales, noise
    [1|B,H,W,1], act_b [C]. Returns [B,H,W,C] in x.dtype.
    """
    B, H, W, C = x.shape
    if th is None:
        th = 16 if (H % 16 == 0 and H >= 32) else H // 2
    assert W % 2 == 0 and H % th == 0, (H, W, th)
    wp = W // 2
    n_h = H // th
    assert n_h >= 2, "row-halo DMA needs at least two row tiles"
    lanes = 2 * C

    xp = x.reshape(B, H, wp, lanes)
    # fold style (input lanes) and demod (output lanes) into per-batch blocks
    blk = build_pair_blocks(w)  # [3,3,2C,2C]
    s_pair = jnp.tile(s_in, (1, 2))  # lane (pi*C+ci) -> s_in[ci]
    d_pair = jnp.tile(d_out, (1, 2))
    wb = (
        blk[None]
        * s_pair[:, None, None, :, None]
        * d_pair[:, None, None, None, :]
    ).astype(x.dtype)

    # noise lane layout: value at pixel 2n+po fills lanes po*C..(po+1)*C
    nz = (noise_w * noise).astype(x.dtype)
    nz = jnp.repeat(nz.reshape(nz.shape[0], H, wp, 2), C, axis=-1)
    nb = 1 if noise.shape[0] == 1 else B
    bias_pair = jnp.tile(act_b, 2)[None, :].astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, th=th, wp=wp, n_h=n_h, lanes=lanes, slope=slope,
            gain=gain
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, wp, lanes), x.dtype),
        grid=(n_h, B),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x, manual halo DMA
            pl.BlockSpec((1, 3, 3, lanes, lanes),
                         lambda hi, bi: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp, lanes),
                         (lambda hi, bi: (0, hi, 0, 0)) if nb == 1
                         else (lambda hi, bi: (bi, hi, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda hi, bi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wp, lanes), lambda hi, bi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(xp, wb, nz, bias_pair)
    return out.reshape(B, H, W, C)


def pair_conv_supported(x_shape, k: int, up: bool, down: bool,
                        min_res: int = 512, max_ch: int = 64) -> bool:
    """Dispatch gate: plain 3x3 convs on thin-channel high-res tensors."""
    b, h, w, c = x_shape
    return (
        k == 3 and not up and not down
        and c <= max_ch and h >= min_res
        and w % 2 == 0 and h % 16 == 0
    )
