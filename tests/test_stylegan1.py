"""StyleGAN1-style generator tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.models import stylegan1 as sg1


def test_fused_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    import math

    rng = np.random.RandomState(0)
    cin, cout, k = 8, 6, 3
    w = rng.randn(cin, cout, k, k).astype(np.float32)  # torch layout [in,out,k,k]
    x = rng.randn(2, cin, 5, 5).astype(np.float32)

    mult = math.sqrt(2 / (cin * k * k))
    wt = torch.from_numpy(w) * mult
    wt = torch.nn.functional.pad(wt, [1, 1, 1, 1])
    wt = (wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]) / 4
    want = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), wt, stride=2, padding=1
    ).numpy()

    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),  # -> [k,k,in,out]
         "b": jnp.zeros((cout,))}
    got = sg1.fused_upsample(p, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    from helpers import assert_close

    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                 rtol=1e-4, atol=1e-4)


def test_fused_downsample_matches_torch():
    torch = pytest.importorskip("torch")
    import math

    rng = np.random.RandomState(1)
    cin, cout, k = 6, 8, 3
    w = rng.randn(cout, cin, k, k).astype(np.float32)  # torch layout [out,in,k,k]
    x = rng.randn(2, cin, 8, 8).astype(np.float32)

    mult = math.sqrt(2 / (cin * k * k))
    wt = torch.from_numpy(w) * mult
    wt = torch.nn.functional.pad(wt, [1, 1, 1, 1])
    wt = (wt[:, :, 1:, 1:] + wt[:, :, :-1, 1:] + wt[:, :, 1:, :-1] + wt[:, :, :-1, :-1]) / 4
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), wt, stride=2, padding=1
    ).numpy()

    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> [k,k,in,out]
         "b": jnp.zeros((cout,))}
    got = sg1.fused_downsample(p, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    from helpers import assert_close

    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                 rtol=1e-4, atol=1e-4)


def test_generator_ladder_and_fade():
    params = sg1.init_styled_generator(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    img = sg1.styled_generator_forward(params, z, step=2, key=jax.random.PRNGKey(2))
    assert img.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    faded = sg1.styled_generator_forward(
        params, z, step=2, alpha=0.5, key=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(img), np.asarray(faded))


def test_style_mixing():
    params = sg1.init_styled_generator(jax.random.PRNGKey(0))
    z1 = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
    noise = [jnp.zeros((1, 4 * 2**i, 4 * 2**i, 1)) for i in range(3)]
    a = sg1.styled_generator_forward(params, [z1, z2], noise=noise, step=2,
                                     inject_index=[0])
    b = sg1.styled_generator_forward(params, [z1], noise=noise, step=2)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # mixing_range variant
    c = sg1.styled_generator_forward(params, [z1, z2], noise=noise, step=2,
                                     mixing_range=(1, 2))
    assert not np.allclose(np.asarray(c), np.asarray(b))


def test_truncation_via_mean_style():
    params = sg1.init_styled_generator(jax.random.PRNGKey(0))
    ms = sg1.mean_style(params, jax.random.PRNGKey(3), n=64)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    noise = [jnp.zeros((2, 4 * 2**i, 4 * 2**i, 1)) for i in range(2)]
    img = sg1.styled_generator_forward(
        params, z, noise=noise, step=1, mean_style_latent=ms, style_weight=0.0
    )
    # style_weight 0 => identical styles for all samples
    np.testing.assert_allclose(np.asarray(img[0]), np.asarray(img[1]), rtol=1e-4,
                               atol=1e-5)
