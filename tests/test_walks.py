"""Walk-module semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latent2im_tpu.walks import (
    REGISTRY,
    apply_walk,
    init_walk,
    resolve_walk_kind,
    walk_space,
)

ATTRS = ["Smiling", "Young"]


@pytest.mark.parametrize("kind", ["linear_w", "mlp_w", "nn_w"])
def test_w_walks_shapes(kind):
    key = jax.random.PRNGKey(0)
    p = init_walk(key, kind, 64, 6, ATTRS)
    latent = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 64))
    alpha = jax.random.uniform(jax.random.PRNGKey(2), (3, 2))
    out = apply_walk(kind, p, latent, alpha)
    assert out.shape == latent.shape
    assert not np.allclose(np.asarray(out), np.asarray(latent))


@pytest.mark.parametrize("kind", ["mlp_z", "linear_z_free", "linear_z", "mlp_z3"])
def test_z_walks_shapes(kind):
    key = jax.random.PRNGKey(0)
    p = init_walk(key, kind, 64, 1, ATTRS)
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 64))
    alpha = jax.random.uniform(jax.random.PRNGKey(2), (3, 2))
    out = apply_walk(kind, p, z, alpha)
    assert out.shape == z.shape


def test_linear_w_is_linear_in_alpha():
    """w' = w + alpha @ W  =>  doubling alpha doubles the delta."""
    p = init_walk(jax.random.PRNGKey(0), "linear_w", 32, 4, ATTRS)
    latent = jnp.zeros((2, 4, 32))
    a = jnp.ones((2, 2)) * 0.3
    d1 = apply_walk("linear_w", p, latent, a)
    d2 = apply_walk("linear_w", p, latent, 2 * a)
    np.testing.assert_allclose(np.asarray(d2), 2 * np.asarray(d1), rtol=1e-5)


def test_linear_w_layer_subset():
    p = init_walk(jax.random.PRNGKey(0), "linear_w", 32, 4, ATTRS)
    latent = jnp.zeros((2, 4, 32))
    a = jnp.ones((2, 2))
    out = apply_walk("linear_w", p, latent, a, layers=(1, 3))
    out = np.asarray(out)
    assert np.allclose(out[:, 0], 0) and np.allclose(out[:, 2], 0)
    assert not np.allclose(out[:, 1], 0) and not np.allclose(out[:, 3], 0)


def test_nn_w_unit_norm_delta():
    p = init_walk(jax.random.PRNGKey(0), "nn_w", 64, 3, ATTRS)
    latent = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64))
    a = jnp.full((2, 2), 0.7)
    out = apply_walk("nn_w", p, latent, a)
    norms = np.linalg.norm(np.asarray(out - latent), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_linear_z_free_reduces_to_reference_single_attr():
    """For one attribute: z + alpha * z * w (pggan transform_base.py:98-102)."""
    p = init_walk(jax.random.PRNGKey(0), "linear_z_free", 16, 1, ["a"])
    z = jax.random.normal(jax.random.PRNGKey(1), (3, 16))
    al = jnp.full((3, 1), 0.5)
    got = apply_walk("linear_z_free", p, z, al)
    want = z + 0.5 * z * p["w"][0][None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_embed_walk():
    p = init_walk(jax.random.PRNGKey(0), "embed", 16, 1, ["a", "b"])
    z = jnp.zeros((2, 16))
    out = apply_walk("embed", p, z, None, name="a", index=3)
    want = np.sum(np.asarray(p["w"]["a"][3, 0]), axis=-1)
    np.testing.assert_allclose(np.asarray(out[0]), want, rtol=1e-5)


def test_resolver_matrix():
    # capability matrix {model} x {walk_type} x {latent} (SURVEY §1)
    assert resolve_walk_kind("stylegan_v2_real", "linear", "w") == "linear_w"
    assert resolve_walk_kind("stylegan_v2_real", "linear", "w", is_mlp=True) == "mlp_w"
    assert resolve_walk_kind("stylegan_v2_real", "NNz", "w") == "nn_w"
    assert resolve_walk_kind("stylegan_v2_real", "linear", "z", is_mlp=True) == "mlp_z"
    assert resolve_walk_kind("pggan", "linear", "z") == "linear_z_free"
    assert resolve_walk_kind("pggan", "NNz", "z") == "mlp_z3"
    assert resolve_walk_kind("stylegan_v2_real", "linear", "w", train_embed=True) == "embed"
    for kind in REGISTRY:
        assert walk_space(kind) in ("w", "z")


def test_walk_grads_flow():
    p = init_walk(jax.random.PRNGKey(0), "linear_w", 32, 4, ATTRS)

    def loss(pp):
        latent = jnp.ones((2, 4, 32))
        a = jnp.ones((2, 2))
        return jnp.sum(apply_walk("linear_w", pp, latent, a) ** 2)

    g = jax.grad(loss)(p)
    assert float(jnp.sum(jnp.abs(g["w"]))) > 0
