"""synthesize() with the fast tail on vs off must agree."""

import numpy as np

import jax
import jax.numpy as jnp

from latent2im_tpu.models import stylegan2 as sg2

TINY = {4: 16, 8: 16, 16: 16, 32: 8, 64: 8}


def test_synthesize_fast_tail_parity(monkeypatch):
    params = sg2.init_generator(jax.random.PRNGKey(0), 64, style_dim=32,
                                n_mlp=2, channels=TINY)
    # exercise the noise path
    params["convs"][-2]["noise_w"] = jnp.asarray(0.3)
    params["convs"][-1]["noise_w"] = jnp.asarray(0.2)
    w = sg2.style_forward(
        params, jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    )
    latent = jnp.repeat(w[:, None, :], sg2.n_latent(64), axis=1)

    monkeypatch.setattr(sg2, "FAST_TAIL_MIN_RES", 64)
    fast_img = sg2.synthesize(params, latent)
    monkeypatch.setattr(sg2, "FAST_TAIL", False)
    ref_img = sg2.synthesize(params, latent)
    from helpers import assert_close

    assert_close(fast_img, ref_img, rtol=5e-4, atol=5e-4, tpu_atol=4e-2, tpu_rtol=4e-2)


def test_synthesize_block_remat_exact(monkeypatch):
    """block_remat=True (per-block jax.checkpoint, incl. the fast-tail chain)
    only changes the backward's memory schedule — values and latent gradients
    must match the plain forward exactly on CPU."""
    params = sg2.init_generator(jax.random.PRNGKey(0), 64, style_dim=32,
                                n_mlp=2, channels=TINY)
    params["convs"][-2]["noise_w"] = jnp.asarray(0.3)
    w = sg2.style_forward(
        params, jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    )
    latent = jnp.repeat(w[:, None, :], sg2.n_latent(64), axis=1)
    # engage the s2d chain so its checkpoint wrapper is exercised too
    monkeypatch.setattr(sg2, "FAST_TAIL_MIN_RES", 64)

    def loss(lat, block_remat):
        img = sg2.synthesize(params, lat, block_remat=block_remat)
        return jnp.sum(img * img)

    from helpers import assert_close

    for fast in (True, False):
        monkeypatch.setattr(sg2, "FAST_TAIL", fast)
        v0, g0 = jax.value_and_grad(lambda l: loss(l, False))(latent)
        v1, g1 = jax.value_and_grad(lambda l: loss(l, True))(latent)
        assert_close(np.asarray([v0]), np.asarray([v1]),
                     rtol=1e-6, atol=0, tpu_rtol=1e-3, tpu_atol=1e-3)
        assert_close(g0, g1, rtol=1e-6, atol=1e-8,
                     tpu_rtol=1e-3, tpu_atol=1e-3)
