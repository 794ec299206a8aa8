"""Pallas TPU kernels for the hot elementwise/FIR ops.

Two kernels re-create what the reference implements in CUDA
(graphs/stylegan_v2_real/op/*.cu):

  * ``fused_leaky_relu_pallas`` — bias + LeakyReLU + sqrt(2) gain, with the
    reference's output-sign backward rule (fused_bias_act_kernel.cu:36-45) as
    a custom VJP.
  * ``upfirdn2d_pallas`` — FIR filter + stride after an XLA zero-stuff/pad
    prepass; tap accumulation runs on the VPU over VMEM tiles with the input
    DMA-ed from HBM per tile. Backward is the reference transpose rule
    (swapped up/down, flipped kernel, g_pad = k - pad - 1;
    op/upfirdn2d.py:110-115).

Both are parity-tested against the XLA paths in tests/test_ops_pallas.py.

STATUS (round 5): ``upfirdn2d_pallas`` is FROZEN as a documented worked
example. Its one fair end-to-end shot (scripts/bench_pallas_ufd.py,
2026-08-19: full train steps with ``impl='pallas_ufd'`` routing upfirdn to
this kernel at every qualifying C%128==0 site) measured 92.9 vs 201.0
samples/s at 256px and 17.2 vs 19.2 at 1024px — identical cost-model FLOPs,
so the loss is pure fusion/launch overhead: each Pallas call is an opaque
boundary that breaks XLA's pad+conv+epilogue (and VJP transpose) fusions
the default conv formulation rides. Default dispatch never selects it;
BASELINE.md carries the ledger entry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    """Pallas TPU kernels run via the interpreter on CPU (tests/dev)."""
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# fused bias + leaky relu + gain
# ---------------------------------------------------------------------------


def _flrelu_fwd_kernel(x_ref, b_ref, o_ref, *, slope, scale):
    x = x_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    o_ref[:] = (jnp.where(x >= 0, x, x * slope) * scale).astype(o_ref.dtype)


def _flrelu_bwd_kernel(g_ref, o_ref, dx_ref, *, slope, scale):
    # Gradient keyed on the sign of the saved *output* (matches the CUDA rule:
    # act=3, grad=1 uses ref>0), valid because the activation is monotone.
    g = g_ref[:].astype(jnp.float32)
    dx = g * jnp.where(o_ref[:].astype(jnp.float32) > 0, scale, scale * slope)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _flrelu_call(kernel, args, shape, dtype, slope, scale, row_block):
    m, c = shape
    grid = (_cdiv(m, row_block),)
    in_specs = []
    for a in args:
        if a.ndim == 1:  # bias, broadcast to every row block
            in_specs.append(
                pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
            )
        else:
            in_specs.append(
                pl.BlockSpec((row_block, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
    args = [a[None, :] if a.ndim == 1 else a for a in args]
    return pl.pallas_call(
        functools.partial(kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((m, c), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (row_block, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(*args)


def _pick_row_block(m, c, dtype_bytes=4, budget=1 << 21):
    rows = max(8, budget // max(1, c * dtype_bytes))
    rows = 1 << (rows.bit_length() - 1)  # power of two
    return int(min(rows, max(8, m)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(x, bias, negative_slope=0.2, scale=2**0.5):
    """Pallas bias+LeakyReLU+gain over [..., C]; bias shape [C]."""
    out, _ = _flrelu_fwd(x, bias, negative_slope, scale)
    return out


def _flrelu_fwd(x, bias, negative_slope, scale):
    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)
    rb = _pick_row_block(x2.shape[0], c)
    out = _flrelu_call(
        _flrelu_fwd_kernel,
        [x2, bias],
        x2.shape,
        x.dtype,
        negative_slope,
        scale,
        rb,
    ).reshape(orig_shape)
    return out, out


def _flrelu_bwd(negative_slope, scale, out, g):
    c = out.shape[-1]
    g2 = g.reshape(-1, c)
    o2 = out.reshape(-1, c)
    rb = _pick_row_block(g2.shape[0], c)
    dx = _flrelu_call(
        _flrelu_bwd_kernel, [g2, o2], g2.shape, g.dtype, negative_slope, scale, rb
    )
    # grad_bias = sum over all non-channel axes (op/fused_act.py:32-37)
    db = jnp.sum(dx, axis=0).astype(out.dtype)
    return dx.reshape(out.shape), db


fused_leaky_relu_pallas.defvjp(_flrelu_fwd, _flrelu_bwd)


# ---------------------------------------------------------------------------
# upfirdn2d: FIR + stride on zero-stuffed input
# ---------------------------------------------------------------------------


def _fir_kernel(x_hbm, kf_ref, o_ref, *, kh, kw, dy, dx, trows, lw, chunk_c):
    """One (batch, row-tile, channel-tile) program.

    The input arrives polyphase-decomposed as [B, dy*dx, Ly, Lw, C]: phase
    (p, q) holds every (dy, dx)-th sample, so the kh*kw tap accumulation below
    only ever needs unit-stride slices (Mosaic forbids strided vector ops).
    DMA the halo'd row range of all phases into VMEM, accumulate on the VPU.
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    th_out = o_ref.shape[1]
    ow = o_ref.shape[2]
    ct = o_ref.shape[3]

    def body(scratch, sem):
        row0 = hi * th_out
        if chunk_c:
            # channel offsets must be lane-aligned (multiples of 128)
            src = x_hbm.at[bi, :, pl.ds(row0, trows), :, pl.ds(ci * ct, ct)]
        else:
            src = x_hbm.at[bi, :, pl.ds(row0, trows), :, :]
        cp = pltpu.make_async_copy(src, scratch, sem)
        cp.start()
        cp.wait()
        v = scratch[:]
        acc = jnp.zeros((th_out, ow, ct), dtype=jnp.float32)
        for ty in range(kh):
            for tx in range(kw):
                phase = (ty % dy) * dx + (tx % dx)
                oy, ox = ty // dy, tx // dx
                sl = lax.slice(
                    v,
                    (phase, oy, ox, 0),
                    (phase + 1, oy + th_out, ox + ow, ct),
                )[0]
                acc = acc + kf_ref[ty, tx] * sl.astype(jnp.float32)
        o_ref[0, :, :, :] = acc.astype(o_ref.dtype)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((dy * dx, trows, lw, o_ref.shape[3]), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA(()),
    )


def _fir_down(xp, kernel, dy, dx):
    """Correlate `xp` (already zero-stuffed+padded, NHWC) with flip(kernel),
    then keep every (dy, dx)-th sample — via polyphase decomposition."""
    b, ph, pw, c = xp.shape
    kh, kw = kernel.shape
    oh = (ph - kh) // dy + 1
    ow = (pw - kw) // dx + 1

    # DMA slices on the lane (channel) dim must be 128-aligned on TPU, so the
    # Pallas path requires C % 128 == 0 (see pallas_supported); small-C call
    # sites dispatch to the XLA conv path instead.
    if c % 128 != 0 and not _interpret():
        raise ValueError(f"upfirdn2d_pallas requires C % 128 == 0, got C={c}")
    if c > 128:
        ct, chunk_c = 128, True
    else:
        ct, chunk_c = c, False

    # Polyphase extents: output position o of phase (p, q) reads phase row
    # o + ty//dy for ty in [0, kh), so each phase needs oh + (kh-1)//dy rows.
    halo_y = (kh - 1) // dy
    halo_x = (kw - 1) // dx
    # DMA slices on the sublane (W) dim must be 8-aligned; pad the phase width.
    lw = _cdiv(ow + halo_x, 8) * 8
    n_phase = dy * dx

    # Row tile sized against the 16MB scoped-VMEM limit: the input scratch
    # (n_phase * trows * lw * ct) plus the double-buffered output block
    # (2 * th * ow * ct) must fit with headroom.
    bytes_per_row = (n_phase * lw + 2 * ow) * ct * 4
    th = max(1, (8 << 20) // max(1, bytes_per_row) - halo_y)
    th = int(min(th, oh, 64))
    trows = th + halo_y
    n_ht = _cdiv(oh, th)
    ly = n_ht * th + halo_y  # padded so the last (masked) tile DMAs in-bounds

    # Build the polyphase view in XLA (strided gathers fuse into the copy).
    phases = []
    for p in range(dy):
        for q in range(dx):
            sub = xp[:, p::dy, q::dx, :][:, :ly, :lw, :]
            pads = ((0, 0), (0, ly - sub.shape[1]), (0, lw - sub.shape[2]), (0, 0))
            phases.append(jnp.pad(sub, pads))
    xph = jnp.stack(phases, axis=1)  # [B, P, Ly, Lw, C]

    kf = jnp.flip(kernel, (0, 1)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _fir_kernel,
            kh=kh,
            kw=kw,
            dy=dy,
            dx=dx,
            trows=trows,
            lw=lw,
            chunk_c=chunk_c,
        ),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, c), xp.dtype),
        grid=(b, n_ht, c // ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((kh, kw), lambda bi, hi, ci: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, ow, ct),
            lambda bi, hi, ci: (bi, hi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(xph, kf)
    return out


def _zero_stuff_pad(x, up_x, up_y, px0, px1, py0, py1):
    b, h, w, c = x.shape
    if up_y > 1 or up_x > 1:
        z = jnp.zeros((b, h * up_y, w * up_x, c), dtype=x.dtype)
        z = z.at[:, ::up_y, ::up_x, :].set(x)
    else:
        z = x
    z = jnp.pad(
        z,
        (
            (0, 0),
            (max(py0, 0), max(py1, 0)),
            (max(px0, 0), max(px1, 0)),
            (0, 0),
        ),
    )
    return z[
        :,
        max(-py0, 0) : z.shape[1] - max(-py1, 0),
        max(-px0, 0) : z.shape[2] - max(-px1, 0),
        :,
    ]


def pallas_supported(x_shape, kernel_shape, up, down) -> bool:
    """Whether the Pallas upfirdn2d path handles this configuration well."""
    c = x_shape[-1]
    if c % 128 != 0:
        return False
    return kernel_shape[0] <= 8 and kernel_shape[1] <= 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def upfirdn2d_pallas(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1):
    out, _ = _ufd_fwd(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1)
    return out


def _ufd_impl(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1):
    xp = _zero_stuff_pad(x, up_x, up_y, px0, px1, py0, py1)
    return _fir_down(xp, kernel, down_y, down_x)


def _ufd_fwd(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1):
    out = _ufd_impl(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1)
    return out, (x.shape, kernel)


def _ufd_bwd(up_x, up_y, down_x, down_y, px0, px1, py0, py1, res, g):
    in_shape, kernel = res
    kh, kw = kernel.shape
    in_h, in_w = in_shape[1], in_shape[2]
    out_h, out_w = g.shape[1], g.shape[2]
    # reference transpose rule (op/upfirdn2d.py:110-115)
    g_px0 = kw - px0 - 1
    g_py0 = kh - py0 - 1
    g_px1 = in_w * up_x - out_w * down_x + px0 - up_x + 1
    g_py1 = in_h * up_y - out_h * down_y + py0 - up_y + 1
    dx = _ufd_impl(
        g,
        jnp.flip(kernel, (0, 1)),
        down_x,
        down_y,
        up_x,
        up_y,
        g_px0,
        g_px1,
        g_py0,
        g_py1,
    )
    return dx, None


upfirdn2d_pallas.defvjp(_ufd_fwd, _ufd_bwd)
