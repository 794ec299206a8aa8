"""Walk-module semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import assert_close

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
    """Full selection table, cell-for-cell with the reference's constructor
    branching (transform_base.py:296-327, pggan transform_base.py:265-276)."""
    SG = "stylegan_v2_real"
    # (model, walk_type, latent, train_embed, is_mlp) -> kind | raises
    table = {
        # stylegan linear family (:297-320)
        (SG, "linear", "w", False, False): "linear_w",
        (SG, "linear", "w", False, True): "mlp_w",
        (SG, "linear", "w", True, False): "embed",
        (SG, "linear", "w", True, True): "embed",
        (SG, "linear", "z", False, True): "mlp_z",
        (SG, "linear", "z", True, False): "embed",
        # reference raises for linear+z without is_mlp (:305-308)
        (SG, "linear", "z", False, False): NotImplementedError,
        # unknown latent raises (:321-323)
        (SG, "linear", "y", False, False): NotImplementedError,
        # NN branch ignores trainEmbed/is_mlp/latent (:325-327 elif order)
        (SG, "NNz", "w", False, False): "nn_w",
        (SG, "NNz", "w", True, False): "nn_w",
        (SG, "NNz", "z", False, True): "nn_w",
        # unknown walk_type falls off the reference if/elif silently; we raise
        (SG, "spline", "w", False, False): NotImplementedError,
        # pggan (pggan transform_base.py:265-276; embed via the
        # name/index bank path, kept selectable under trainEmbed)
        ("pggan", "linear", "z", False, False): "linear_z_free",
        ("pggan", "NNz", "z", False, False): "mlp_z3",
        ("pggan", "mlp", "z", False, False): "mlp_z3",
        ("pggan", "linear", "z", True, False): "embed",
    }
    for (model, wt, lat, emb, mlp), want in table.items():
        if want is NotImplementedError:
            with pytest.raises(NotImplementedError):
                resolve_walk_kind(model, wt, lat, train_embed=emb, is_mlp=mlp)
        else:
            got = resolve_walk_kind(model, wt, lat, train_embed=emb, is_mlp=mlp)
            assert got == want, (model, wt, lat, emb, mlp, got, want)
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


def test_convert_walk_mlp_multi_z_matches_torch_layout():
    """WalkMlpMultiZ checkpoint conversion onto the mlp_z layout: applying
    the converted params must reproduce the reference forward math
    (embed one-hot -> concat z -> MLP -> normalized delta * alpha)."""
    import numpy as np

    from latent2im_tpu.io import torch_convert as tc
    from latent2im_tpu.walks.walks import apply_mlp_z

    rng = np.random.RandomState(0)
    D = 16
    state = {"embed.weight": rng.randn(D, 10).astype(np.float32),
             "embed.bias": rng.randn(D).astype(np.float32)}
    dims = [(2 * D, D), (D, D), (D, D)]
    for i, (fi, fo) in zip((0, 2, 4), dims):
        state[f"linear.{i}.weight"] = rng.randn(fo, fi).astype(np.float32)
        state[f"linear.{i}.bias"] = rng.randn(fo).astype(np.float32)
    params = tc.convert_walk_state("WalkMlpMultiZ", state, ["Smiling"])

    z = rng.randn(3, D).astype(np.float32)
    alpha = np.full((3, 1), 0.7, np.float32)

    # reference math (transform_base.py:86-111), numpy
    direction = np.zeros((3, 10), np.float32); direction[:, 0] = 1
    emb = direction @ state["embed.weight"].T + state["embed.bias"]
    h = np.concatenate([emb, z], axis=1)
    for i in (0, 2, 4):
        h = h @ state[f"linear.{i}.weight"].T + state[f"linear.{i}.bias"]
        if i < 4:
            h = np.where(h > 0, h, 0.2 * h)
    want = z + alpha * h / np.linalg.norm(h, axis=1, keepdims=True)

    got = apply_mlp_z(params, jnp.asarray(z), jnp.asarray(alpha))
    assert_close(got, want, rtol=2e-4, atol=2e-5)


def test_convert_walk_linear_bank():
    """WalkLinear (stylegan z direction bank) -> linear_z_dir layout."""
    import numpy as np

    from latent2im_tpu.io import torch_convert as tc
    from latent2im_tpu.walks.walks import apply_linear_z_dir

    rng = np.random.RandomState(1)
    state = {"w.Smiling": rng.randn(1, 8, 1).astype(np.float32),
             "w.Young": rng.randn(1, 8, 1).astype(np.float32)}
    params = tc.convert_walk_state("WalkLinear", state, ["Smiling", "Young"])
    assert params["w"].shape == (2, 8)

    z = rng.randn(2, 8).astype(np.float32)
    alpha = rng.rand(2, 2).astype(np.float32)
    got = apply_linear_z_dir(params, jnp.asarray(z), jnp.asarray(alpha))
    want = z + alpha @ np.stack([state["w.Smiling"][0, :, 0],
                                 state["w.Young"][0, :, 0]])
    assert_close(got, want, rtol=1e-5, atol=1e-6)

    # names derived from keys when attr_list is empty
    p2 = tc.convert_walk_state("WalkLinear", state, [])
    assert p2["w"].shape == (2, 8)


def test_convert_walk_linear_z_single():
    import numpy as np

    from latent2im_tpu.io import torch_convert as tc
    from latent2im_tpu.walks.walks import apply_linear_z

    rng = np.random.RandomState(2)
    state = {"linear.weight": rng.randn(8, 8).astype(np.float32),
             "linear.bias": rng.randn(8).astype(np.float32)}
    params = tc.convert_walk_state("WalkLinearZ", state, ["attr"])
    z = rng.randn(2, 8).astype(np.float32)
    alpha = np.full((2, 1), 0.4, np.float32)
    out = z @ state["linear.weight"].T + state["linear.bias"]
    want = z + 0.4 * out / np.linalg.norm(out, axis=1, keepdims=True) * 3.0
    got = apply_linear_z(params, jnp.asarray(z), jnp.asarray(alpha))
    assert_close(got, want, rtol=2e-4, atol=2e-5)


def test_embed_walk_default_bank():
    """Editor.edit calls walks without a name; embed must fall back to the
    single trained bank instead of KeyError (the --trainEmbed path)."""
    from latent2im_tpu.walks import apply_walk, init_walk

    params = init_walk(jax.random.PRNGKey(0), "embed", 8, 4, ["Smiling"])
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    alpha = jnp.full((2, 1), 0.5)
    out = apply_walk("embed", params, z, alpha)  # no name kwarg
    assert out.shape == z.shape
    assert not np.allclose(np.asarray(out), np.asarray(z))
