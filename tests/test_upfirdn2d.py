"""Parity tests: XLA upfirdn2d vs independent tap-loop oracle, plus gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent2im_tpu.ops import (
    blur2d,
    downsample2d,
    make_kernel,
    upfirdn2d,
    upfirdn2d_ref,
    upsample2d,
)

CASES = [
    # (up, down, pad, kernel_taps, H, W)
    (1, 1, (1, 1), [1, 3, 3, 1], 8, 8),       # blur after conv-transpose
    (1, 1, (2, 1), [1, 3, 3, 1], 9, 7),       # asymmetric pad
    (2, 1, (2, 1), [1, 3, 3, 1], 8, 8),       # stylegan2 upsample
    (1, 2, (2, 2), [1, 3, 3, 1], 16, 16),     # stylegan2 downsample (k=3 conv)
    (1, 2, (1, 1), [1, 3, 3, 1], 16, 16),     # downsample (k=1 skip)
    (2, 1, (1, 1), [1, 2, 1], 8, 8),          # odd kernel
    (1, 1, (-1, 2), [1, 3, 3, 1], 12, 12),    # negative pad (crop)
    (2, 2, (1, 1), [1, 3, 3, 1], 8, 10),      # up and down together
]


@pytest.mark.parametrize("up,down,pad,taps,h,w", CASES)
def test_xla_matches_oracle(up, down, pad, taps, h, w):
    rng = np.random.RandomState(0)
    x = rng.randn(2, h, w, 5).astype(np.float32)
    k = np.asarray(make_kernel(taps))
    want = upfirdn2d_ref(x, k, up=up, down=down, pad=pad)
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    assert got.shape == want.shape
    from helpers import assert_close

    assert_close(got, want)


def test_output_size_formula():
    # out = (in*up + pad0 + pad1 - k)//down + 1  (reference op/upfirdn2d.py:102-103)
    x = jnp.ones((1, 8, 8, 4))
    k = make_kernel([1, 3, 3, 1])
    out = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    assert out.shape == (1, (8 * 2 + 3 - 4) // 1 + 1, (8 * 2 + 3 - 4) // 1 + 1, 4)
    out = upfirdn2d(x, k, up=1, down=2, pad=(2, 2))
    assert out.shape == (1, (8 + 4 - 4) // 2 + 1, (8 + 4 - 4) // 2 + 1, 4)


def test_upsample_preserves_mean():
    # kernel normalized to 1 and scaled by factor^2 => mean preserved
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    up = upsample2d(x, k)
    assert up.shape == (2, 16, 16, 4)
    np.testing.assert_allclose(
        float(jnp.mean(up)), float(jnp.mean(x)), rtol=0, atol=0.02
    )


def test_down_then_shape():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 16, 16, 4).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    d = downsample2d(x, k)
    assert d.shape == (2, 8, 8, 4)


def test_blur_identity_kernel():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 6, 6, 3).astype(np.float32))
    k = jnp.ones((1, 1), dtype=jnp.float32)
    out = blur2d(x, k, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6, atol=1e-6)


def test_gradients_match_oracle_numerics():
    """Autodiff grad of the conv path == finite-difference of the oracle."""
    rng = np.random.RandomState(4)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    k = np.asarray(make_kernel([1, 3, 3, 1]))

    def f(xx):
        return jnp.sum(upfirdn2d(xx, jnp.asarray(k), up=2, down=1, pad=(2, 1)) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))

    eps = 1e-3
    idxs = [(0, 0, 0, 0), (0, 3, 2, 1), (0, 5, 5, 0)]
    for idx in idxs:
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        fp = np.sum(upfirdn2d_ref(xp, k, up=2, down=1, pad=(2, 1)) ** 2)
        fm = np.sum(upfirdn2d_ref(xm, k, up=2, down=1, pad=(2, 1)) ** 2)
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=2e-2)
