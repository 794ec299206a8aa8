"""StyleGAN2 model tests.

The key correctness test: the batched modulated-conv formulation (input-scale +
shared conv + analytic demod) must match the defining per-sample math (build
each sample's modulated+demodulated weight explicitly, conv per sample) — the
formulation the reference computes via batch-grouped convs (networks.py:231-272).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.ops import upfirdn2d_mod as ufd

TINY_CHANNELS = {4: 32, 8: 32, 16: 16, 32: 16, 64: 16, 128: 8, 256: 8}


def _naive_modulated(p, x, style, demodulate, up=False):
    """Defining math: explicit per-sample weights, vmap'd single-sample conv."""
    k = p["w"].shape[0]
    in_ch = p["w"].shape[2]
    scale = 1.0 / math.sqrt(in_ch * k * k)
    s = sg2.equal_linear(p["mod"], style)  # [B, Cin]
    # per-sample weight [B, kh, kw, Cin, Cout]
    w = scale * p["w"][None] * s[:, None, None, :, None]
    if demodulate:
        demod = lax.rsqrt(jnp.sum(w * w, axis=(1, 2, 3)) + 1e-8)  # [B, Cout]
        w = w * demod[:, None, None, None, :]

    def one(xi, wi):
        xi = xi[None]
        if up:
            return lax.conv_general_dilated(
                xi,
                jnp.flip(wi, (0, 1)),
                window_strides=(1, 1),
                padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]
        return lax.conv_general_dilated(
            xi,
            wi,
            window_strides=(1, 1),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    return jax.vmap(one)(x, w)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_naive(demodulate):
    key = jax.random.PRNGKey(0)
    p = sg2.init_modulated_conv(key, 16, 24, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 8, 16))
    style = jax.random.normal(jax.random.PRNGKey(2), (3, 32))
    got = sg2.modulated_conv2d(p, x, style, demodulate=demodulate)
    want = _naive_modulated(p, x, style, demodulate)
    from helpers import assert_close

    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_modulated_conv_up_matches_naive():
    key = jax.random.PRNGKey(3)
    p = sg2.init_modulated_conv(key, 16, 8, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 16))
    style = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
    got = sg2.modulated_conv2d(p, x, style, up=True)
    # naive: per-sample transpose-conv then the same blur
    raw = _naive_modulated(p, x, style, True, up=True)
    blur = ufd.make_kernel(list(sg2.BLUR_KERNEL))
    want = ufd.blur2d(raw, blur, pad=(1, 1), upsample_factor=2)
    assert got.shape == (2, 12, 12, 8)
    from helpers import assert_close

    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_generator_shapes_and_finite():
    key = jax.random.PRNGKey(0)
    params = sg2.init_generator(key, 32, style_dim=64, n_mlp=2, channels=TINY_CHANNELS)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    img = sg2.generator_forward(params, z)
    assert img.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_generator_wplus_injection():
    """Per-layer W+ styles steer independent layers."""
    key = jax.random.PRNGKey(0)
    params = sg2.init_generator(key, 32, style_dim=64, n_mlp=2, channels=TINY_CHANNELS)
    nl = sg2.n_latent(32)
    w = sg2.style_forward(params, jax.random.normal(jax.random.PRNGKey(1), (2, 64)))
    latent = jnp.repeat(w[:, None, :], nl, axis=1)
    img0 = sg2.synthesize(params, latent)
    latent2 = latent.at[:, 0, :].add(1.0)
    img1 = sg2.synthesize(params, latent2)
    assert not np.allclose(np.asarray(img0), np.asarray(img1))


def test_truncation():
    key = jax.random.PRNGKey(0)
    params = sg2.init_generator(key, 32, style_dim=64, n_mlp=2, channels=TINY_CHANNELS)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    w_mean = sg2.mean_latent(params, jax.random.PRNGKey(2), n=256)
    img_t0 = sg2.generator_forward(
        params, z, truncation=0.0, truncation_latent=w_mean[:, None, :]
    )
    # truncation 0 => all samples collapse to the mean-latent image
    np.testing.assert_allclose(
        np.asarray(img_t0[0]), np.asarray(img_t0[1]), rtol=1e-4, atol=1e-4
    )


def test_noise_injection_changes_output():
    key = jax.random.PRNGKey(0)
    params = sg2.init_generator(key, 32, style_dim=64, n_mlp=2, channels=TINY_CHANNELS)
    # noise weights init to 0 -> noise has no effect until trained; force nonzero
    params["conv1"]["noise_w"] = jnp.ones(())
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 64))
    i1 = sg2.generator_forward(params, z, key=jax.random.PRNGKey(10), size=32)
    i2 = sg2.generator_forward(params, z, key=jax.random.PRNGKey(11), size=32)
    assert not np.allclose(np.asarray(i1), np.asarray(i2))
    # fixed buffers -> deterministic
    i3 = sg2.generator_forward(params, z)
    i4 = sg2.generator_forward(params, z)
    np.testing.assert_allclose(np.asarray(i3), np.asarray(i4))


def test_discriminator_shape_and_grad():
    key = jax.random.PRNGKey(0)
    params = sg2.init_discriminator(key, 32, channels=TINY_CHANNELS)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    out = sg2.discriminator_forward(params, img)
    assert out.shape == (4, 1)

    def loss(im):
        return jnp.sum(sg2.discriminator_forward(params, im))

    g = jax.grad(loss)(img)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_minibatch_stddev_groups():
    x = jnp.ones((4, 4, 4, 8))
    out = sg2.minibatch_stddev(x)
    assert out.shape == (4, 4, 4, 9)
    # constant input -> zero-ish stddev channel
    np.testing.assert_allclose(np.asarray(out[..., -1]), np.sqrt(1e-8), rtol=1e-2)


def test_minibatch_stddev_non_divisible_batch():
    # The reference's view(group, -1, ...) crashes when batch % group != 0
    # (networks.py:630-633); here g falls back to the largest divisor <= 4,
    # so e.g. B=10 groups as (2,5) and stays defined (the 1024px B=10 probe).
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(10, 4, 4, 8).astype(np.float32))
    out = sg2.minibatch_stddev(x)
    assert out.shape == (10, 4, 4, 9)
    # g=2 with the reference's strided grouping (view(g, b//g) then
    # repeat(g, ...)): members i and i + b//g share the stat
    stat = np.asarray(out[..., -1])
    np.testing.assert_allclose(stat[0], stat[5])
    assert not np.allclose(stat[0], stat[1])
    # divisible batches keep g == group_size: members i and i + b//g share
    out8 = np.asarray(sg2.minibatch_stddev(x[:8])[..., -1])
    np.testing.assert_allclose(out8[0], out8[2])
    np.testing.assert_allclose(out8[0], out8[6])
    assert not np.allclose(out8[0], out8[1])
