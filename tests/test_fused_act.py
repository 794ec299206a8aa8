"""Tests for fused bias + LeakyReLU + gain (XLA path)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from latent2im_tpu.ops import fused_leaky_relu


def test_forward_semantics():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 8, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    out = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xb = x + b
    want = np.where(xb >= 0, xb, xb * 0.2) * math.sqrt(2)
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


def test_no_bias():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    out = np.asarray(fused_leaky_relu(x, None))
    np.testing.assert_allclose(
        out, np.array([-0.2, 0.0, 2.0]) * math.sqrt(2), rtol=1e-6
    )


def test_gradients():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    b = jnp.asarray(rng.randn(16).astype(np.float32))

    def f(xx, bb):
        return jnp.sum(fused_leaky_relu(xx, bb) ** 2)

    gx, gb = jax.grad(f, argnums=(0, 1))(x, b)
    # finite differences on a few coordinates
    eps = 1e-3
    f0 = float(f(x, b))

    xp = x.at[2, 3].add(eps)
    np.testing.assert_allclose(
        float(gx[2, 3]), (float(f(xp, b)) - f0) / eps, rtol=5e-2, atol=5e-2
    )
    bp = b.at[5].add(eps)
    np.testing.assert_allclose(
        float(gb[5]), (float(f(x, bp)) - f0) / eps, rtol=5e-2, atol=5e-2
    )


def test_pallas_impl_accepts_none_bias():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    want = fused_leaky_relu(x, None)
    got = fused_leaky_relu(x, None, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
