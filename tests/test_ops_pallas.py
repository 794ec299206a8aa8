"""Parity tests for the Pallas kernels vs the XLA paths.

On CPU these run through the Pallas interpreter (interpret mode is forced via
pltpu.force_tpu_interpret_mode); on TPU they compile for real.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from latent2im_tpu.ops import fused_leaky_relu, make_kernel, upfirdn2d, upfirdn2d_ref
from latent2im_tpu.ops.pallas_kernels import (
    fused_leaky_relu_pallas,
    upfirdn2d_pallas,
)

ON_TPU = jax.default_backend() == "tpu"


# Kernels auto-interpret on CPU (see pallas_kernels._interpret).


def test_flrelu_pallas_forward():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    got = fused_leaky_relu_pallas(x, b)
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_flrelu_pallas_grad():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))

    def f_p(xx, bb):
        return jnp.sum(fused_leaky_relu_pallas(xx, bb) ** 2)

    def f_x(xx, bb):
        return jnp.sum(fused_leaky_relu(xx, bb) ** 2)

    gp = jax.grad(f_p, argnums=(0, 1))(x, b)
    gx = jax.grad(f_x, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-5, atol=1e-5)


UFD_CASES = [
    (1, 1, (1, 1), 8, 8),
    (2, 1, (2, 1), 8, 8),
    (1, 2, (2, 2), 16, 16),
]


@pytest.mark.parametrize("up,down,pad,h,w", UFD_CASES)
def test_upfirdn_pallas_matches_xla(up, down, pad, h, w):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, h, w, 128).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    # Compare against the f64 tap-loop oracle: the Pallas kernel accumulates
    # in true f32, while XLA's TPU convs use bf16x3 excess-precision passes
    # (~1e-3 abs), so the oracle is the tighter reference.
    want = upfirdn2d_ref(np.asarray(x), np.asarray(k), up=up, down=down, pad=pad)
    got = upfirdn2d_pallas(x, k, up, up, down, down, pad[0], pad[1], pad[0], pad[1])
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=1e-4, atol=1e-4
    )


def test_upfirdn_impl_pallas_ufd_dispatch():
    """impl='pallas_ufd' routes qualifying upfirdn sites to the Pallas
    kernel (same values) while fused_act treats it as the default path —
    the isolation knob scripts/bench_pallas_ufd.py measures with."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])
    want = upfirdn2d_ref(np.asarray(x), np.asarray(k), up=2, pad=(2, 1))
    got = upfirdn2d(x, k, up=2, pad=(2, 1), impl="pallas_ufd")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    # C=3 falls back to the conv path instead of failing
    x3 = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    want3 = upfirdn2d_ref(np.asarray(x3), np.asarray(k), up=2, pad=(2, 1))
    got3 = upfirdn2d(x3, k, up=2, pad=(2, 1), impl="pallas_ufd")
    np.testing.assert_allclose(np.asarray(got3), want3, rtol=1e-4, atol=1e-4)
    # fused_act: 'pallas_ufd' is NOT its pallas switch (stays on XLA path)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_leaky_relu(x, b, impl="pallas_ufd")),
        np.asarray(fused_leaky_relu(x, b)),
        rtol=0, atol=0,
    )


def test_upfirdn_pallas_grad_matches_xla():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])

    def f_p(xx):
        return jnp.sum(upfirdn2d_pallas(xx, k, 2, 2, 1, 1, 2, 1, 2, 1) ** 2)

    def f_x(xx):
        return jnp.sum(upfirdn2d(xx, k, up=2, down=1, pad=(2, 1)) ** 2)

    gp = jax.grad(f_p)(x)
    gx = jax.grad(f_x)(x)
    # XLA TPU convs run bf16x3 excess-precision (~1e-3 abs); CPU is exact f32.
    tol = 3e-3 if ON_TPU else 1e-4
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=tol, atol=tol)
