"""upfirdn2d — fused upsample + FIR filter + downsample, TPU-native.

Semantics match the reference CUDA op (reference: graphs/stylegan_v2_real/op/
upfirdn2d.py:144-187, op/upfirdn2d_kernel.cu): zero-stuff the input by ``up``,
pad by ``pad`` (negative pads crop), cross-correlate with the *flipped* FIR
kernel (i.e. convolve with the kernel), then keep every ``down``-th sample:

    out_h = (in_h*up + pad0 + pad1 - kh) // down + 1

Layout is NHWC (TPU-native), unlike the reference's NCHW.

Implementations:
  * ``_upfirdn2d_xla`` — one ``lax.conv_general_dilated`` call: lhs_dilation
    performs the zero-stuffing, window strides the downsampling, and the
    depthwise FIR rides the conv units. XLA fuses surrounding elementwise ops.
  * ``upfirdn2d_ref`` — an independent tap-loop oracle used by parity tests.
  * a Pallas separable fast path lives in ``pallas_kernels.py`` and is
    dispatched from here when applicable.

The gradient is XLA's exact conv transpose (the reference implements the same
rule by hand: swapped up/down, flipped kernel, g_pad = k - pad - 1; see
op/upfirdn2d.py:110-115).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> np.ndarray:
    """Build a normalized 2D FIR kernel from a 1D or 2D tap list.

    Mirrors reference networks.py:19-27: outer-product a 1D kernel with itself,
    then normalize to unit sum. Returns a HOST numpy array: FIR kernels are
    tiny static filters, and keeping them concrete lets the dispatcher inspect
    separability at trace time (the separable polyphase fast path).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / np.sum(k)


def _separable_factors(kernel) -> tuple[np.ndarray, np.ndarray] | None:
    """Rank-1 factorization k = outer(kv, kh) if the (concrete) kernel is
    separable; None for traced or non-separable kernels."""
    if isinstance(kernel, jax.core.Tracer):
        return None
    k = np.asarray(kernel, np.float64)
    u, s, vt = np.linalg.svd(k)
    if k.shape[0] > 1 and k.shape[1] > 1 and s[1] > 1e-6 * s[0]:
        return None
    kv = u[:, 0] * np.sqrt(s[0])
    kh = vt[0] * np.sqrt(s[0])
    if kv.sum() < 0:  # fix sign so both factors are positive-sum
        kv, kh = -kv, -kh
    return kv.astype(np.float32), kh.astype(np.float32)


def _as_pads(pad):
    """Normalize pad argument to (px0, px1, py0, py1)."""
    if len(pad) == 2:
        return pad[0], pad[1], pad[0], pad[1]
    if len(pad) == 4:
        return tuple(pad)
    raise ValueError(f"pad must have 2 or 4 elements, got {pad}")


def upfirdn2d(
    x: jax.Array,
    kernel: jax.Array,
    up: int = 1,
    down: int = 1,
    pad=(0, 0),
    impl: str | None = None,
) -> jax.Array:
    """Upsample, FIR-filter and downsample a batch of NHWC images.

    Args:
      x: [B, H, W, C] input.
      kernel: [kh, kw] FIR kernel (float32).
      up/down: integer resampling factors (applied to both spatial dims).
      pad: (pad0, pad1) applied to both dims, or (px0, px1, py0, py1).
      impl: 'xla' | 'pallas' | 'pallas_ufd' | None (auto). 'pallas_ufd'
        routes ONLY upfirdn2d to the Pallas kernel (fused_act ignores it) —
        the knob for measuring the upfirdn kernel end-to-end in isolation.
    """
    px0, px1, py0, py1 = _as_pads(pad)
    if impl in ("pallas", "pallas_ufd"):
        from . import pallas_kernels

        if pallas_kernels.pallas_supported(x.shape, kernel.shape, up, down):
            return pallas_kernels.upfirdn2d_pallas(
                x, kernel, up, up, down, down, px0, px1, py0, py1
            )
        impl = None  # unsupported shape (e.g. C=3 rgb skip): conv fallback
    if impl == "conv":
        return _upfirdn2d_xla(x, kernel, up, up, down, down, px0, px1, py0, py1)
    if impl == "stencil":
        return _upfirdn2d_stencil(x, kernel, up, up, down, down, px0, px1, py0, py1)
    if impl == "separable":
        out = _upfirdn2d_separable(
            x, kernel, up, up, down, down, px0, px1, py0, py1
        )
        if out is not None:
            return out
    # Default: the depthwise-conv formulation. Standalone microbenchmarks put
    # the separable polyphase path 1.7x ahead on the biggest blur, but END TO
    # END the conv form fuses better with the surrounding graph (72 vs 53
    # img/s on the 1024px edit pipeline) — keep conv unless told otherwise.
    return _upfirdn2d_xla(x, kernel, up, up, down, down, px0, px1, py0, py1)


def _pad_axis(x, axis, lo, hi):
    pads = [(0, 0)] * x.ndim
    pads[axis] = (max(lo, 0), max(hi, 0))
    x = jnp.pad(x, pads)
    if lo < 0 or hi < 0:
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(max(-lo, 0), x.shape[axis] - max(-hi, 0))
        x = x[tuple(idx)]
    return x


def _slice_axis(x, axis, start, size, stride=1):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + (size - 1) * stride + 1, stride)
    return x[tuple(idx)]


def _fir1d_axis(x, taps: np.ndarray, axis: int, up: int, down: int,
                pad0: int, pad1: int):
    """1-D resample+FIR along `axis` via polyphase — the zero-stuffed array is
    never materialized. taps are concrete host floats (flipped here)."""
    k = len(taps)
    kf = taps[::-1]
    n = x.shape[axis]
    out_len = (n * up + pad0 + pad1 - k) // down + 1

    if up == 1:
        # padded length n+pad0+pad1 always covers (out_len-1)*down + k
        xp = _pad_axis(x, axis, pad0, pad1)
        acc = None
        for t in range(k):
            term = float(kf[t]) * _slice_axis(xp, axis, t, out_len, down)
            acc = term if acc is None else acc + term
        return acc

    if down != 1:  # rare combined case: fall back to caller's generic path
        return None

    # up-phase decomposition: output phase q reads x[m + (q + t - pad0)//up]
    # for taps with (q + t - pad0) % up == 0.
    phases = []
    sizes = []
    for q in range(up):
        o_q = -(-(out_len - q) // up)  # ceil
        sizes.append(o_q)
        offs = [(t, (q + t - pad0) // up) for t in range(k)
                if (q + t - pad0) % up == 0]
        if not offs:
            shape = list(x.shape)
            shape[axis] = o_q
            phases.append(jnp.zeros(shape, x.dtype))
            continue
        lo = min(j for _, j in offs)
        hi = max(j for _, j in offs) + o_q - 1
        xp = _pad_axis(x, axis, -lo if lo < 0 else 0,
                       max(0, hi - (n - 1)))
        base = max(-lo, 0)
        acc = None
        for t, j in offs:
            term = float(kf[t]) * _slice_axis(xp, axis, base + j, o_q)
            acc = term if acc is None else acc + term
        phases.append(acc)

    # interleave phases: pad ragged phases, stack, reshape, trim
    o_max = max(sizes)
    padded = [
        _pad_axis(p, axis, 0, o_max - p.shape[axis]) if p.shape[axis] < o_max else p
        for p in phases
    ]
    stacked = jnp.stack(padded, axis=axis + 1)  # [..., o_max, up, ...]
    shape = list(x.shape)
    shape[axis] = o_max * up
    out = stacked.reshape(shape)
    return _slice_axis(out, axis, 0, out_len)


def _upfirdn2d_separable(x, kernel, up_x, up_y, down_x, down_y,
                         px0, px1, py0, py1):
    """Separable polyphase path (None if not applicable)."""
    factors = _separable_factors(kernel)
    if factors is None:
        return None
    kv, kh = factors
    v = _fir1d_axis(x, kv, 1, up_y, down_y, py0, py1)
    if v is None:
        return None
    h = _fir1d_axis(v, kh, 2, up_x, down_x, px0, px1)
    return h


def _upfirdn2d_stencil(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1):
    """Shifted-slice tap accumulation: XLA fuses the kh*kw multiply-adds into
    one elementwise stencil pass — far faster than the depthwise-conv lowering
    for small channel counts (the hot high-res layers), which Mosaic does not
    map to the MXU. Polyphase on the output avoids strided writes."""
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    kflip = jnp.flip(kernel, (0, 1))

    if up_y > 1 or up_x > 1:
        z = jnp.zeros((b, h * up_y, w * up_x, c), dtype=x.dtype)
        z = z.at[:, ::up_y, ::up_x, :].set(x)
    else:
        z = x
    z = jnp.pad(
        z,
        ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)),
    )
    z = z[
        :,
        max(-py0, 0) : z.shape[1] - max(-py1, 0),
        max(-px0, 0) : z.shape[2] - max(-px1, 0),
        :,
    ]
    ph, pw = z.shape[1], z.shape[2]
    oh = (ph - kh) // down_y + 1
    ow = (pw - kw) // down_x + 1

    acc = None
    for ty in range(kh):
        for tx in range(kw):
            sl = lax.slice(
                z,
                (0, ty, tx, 0),
                (b, ty + (oh - 1) * down_y + 1, tx + (ow - 1) * down_x + 1, c),
                (1, down_y, down_x, 1),
            )
            term = kflip[ty, tx].astype(x.dtype) * sl
            acc = term if acc is None else acc + term
    return acc


def _upfirdn2d_xla(x, kernel, up_x, up_y, down_x, down_y, px0, px1, py0, py1):
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # Cross-correlate with the flipped kernel == convolve with the kernel.
    rhs = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    rhs = jnp.broadcast_to(rhs[:, :, None, None], (kh, kw, 1, c))
    # lhs_dilation zero-stuffs to (H-1)*up + 1; the reference zero-stuffs to
    # H*up (trailing zeros), so fold the missing up-1 zeros into the high pad.
    out = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down_y, down_x),
        padding=((py0, py1 + up_y - 1), (px0, px1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upfirdn2d_ref(x, kernel, up=1, down=1, pad=(0, 0)):
    """Independent tap-loop oracle for parity tests (slow, f32, NHWC).

    Implements the definition directly: zero-stuff, pad/crop, explicit
    shift-and-accumulate over kernel taps, stride-slice. Shares no code with
    the conv-based fast path.
    """
    px0, px1, py0, py1 = _as_pads(pad)
    x = np.asarray(x, dtype=np.float64)
    kernel = np.asarray(kernel, dtype=np.float64)
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # zero-stuff (trailing zeros, matching the reference native impl)
    up_arr = np.zeros((b, h * up, w * up, c), dtype=x.dtype)
    up_arr[:, ::up, ::up, :] = x

    # pad (positive) then crop (negative)
    padded = np.pad(
        up_arr,
        ((0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0)), (0, 0)),
    )
    padded = padded[
        :,
        max(-py0, 0) : padded.shape[1] - max(-py1, 0),
        max(-px0, 0) : padded.shape[2] - max(-px1, 0),
        :,
    ]

    ph, pw = padded.shape[1], padded.shape[2]
    oh = ph - kh + 1
    ow = pw - kw + 1
    out = np.zeros((b, oh, ow, c), dtype=x.dtype)
    # cross-correlation with the flipped kernel
    kflip = kernel[::-1, ::-1]
    for iy in range(kh):
        for ix in range(kw):
            out += kflip[iy, ix] * padded[:, iy : iy + oh, ix : ix + ow, :]
    return out[:, ::down, ::down, :]


# ---------------------------------------------------------------------------
# StyleGAN2-style resampling wrappers (pad conventions per networks.py:30-88).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("factor", "impl"))
def upsample2d(x, kernel, factor: int = 2, impl: str | None = None):
    """2x (or ``factor``x) upsample with FIR smoothing (networks.py:30-48)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(
        x, kernel * (factor**2), up=factor, down=1, pad=(pad0, pad1), impl=impl
    )


@functools.partial(jax.jit, static_argnames=("factor", "impl"))
def downsample2d(x, kernel, factor: int = 2, impl: str | None = None):
    """FIR-smoothed downsample (networks.py:51-69)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1), impl=impl)


def blur2d(x, kernel, pad, upsample_factor: int = 1, impl: str | None = None):
    """Plain FIR blur with explicit pads (networks.py:72-88)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, up=1, down=1, pad=pad, impl=impl)
