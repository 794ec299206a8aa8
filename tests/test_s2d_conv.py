"""Space-to-depth conv equivalence tests."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from latent2im_tpu.models import stylegan2 as sg2


def _direct_conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_s2d_matches_direct():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 5).astype(np.float32))
    got = sg2._conv3x3_s2d(x, w)
    want = _direct_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_s2d_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 8, 4)
    np.testing.assert_array_equal(
        np.asarray(sg2._depth_to_space(sg2._space_to_depth(x))), np.asarray(x)
    )


def test_modulated_conv_uses_s2d_consistently(monkeypatch):
    """With the s2d threshold lowered, the dispatch must be numerically
    invisible."""
    monkeypatch.setattr(sg2, "S2D_MIN_RES", 256)
    key = jax.random.PRNGKey(0)
    p = sg2.init_modulated_conv(key, 32, 32, 3, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 32))
    style = jax.random.normal(jax.random.PRNGKey(2), (1, 64))
    got = sg2.modulated_conv2d(p, x, style)  # s2d path (res 256, ch 32)
    # force the direct path by shrinking below the threshold on a sub-image:
    # instead compare against a manual direct conv with the same scaled weights
    import math

    s = sg2.equal_linear(p["mod"], style)
    scale = 1.0 / math.sqrt(32 * 9)
    w_sq = jnp.sum(jnp.square(p["w"]), axis=(0, 1))
    demod = jax.lax.rsqrt((scale * scale) * (jnp.square(s) @ w_sq) + 1e-8)
    xs = x * s[:, None, None, :]
    want = _direct_conv3x3(xs, p["w"] * scale) * demod[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3,
                               atol=2e-3)


def test_resnet_stem_s2d_matches_direct():
    from latent2im_tpu.models import resnet as rn

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(7, 7, 3, 8).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.randn(2, 16, 20, 3).astype(np.float32))
    want = rn.conv2d(w, x, stride=2, padding=3)
    got = rn._stem_conv_s2d(w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_stem_pool_s2d4_matches_plain_path():
    """Fused stem+BN+relu+maxpool on the 4x4 block grid vs the plain
    sequence (resnet._stem_pool_s2d4)."""
    from latent2im_tpu.models import resnet as rn

    rng = np.random.RandomState(3)
    key = jax.random.PRNGKey(0)
    stem = rn.init_conv_bn(key, 7, 7, 3, 16)
    stem["mean"] = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    stem["var"] = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    stem["gamma"] = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    stem["beta"] = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.randn(2, 32, 24, 3).astype(np.float32))

    want = rn.conv2d(stem["w"], x, stride=2, padding=3)
    want, _ = rn.batch_norm(stem, want)
    want = rn.max_pool(jax.nn.relu(want))

    got, stats = rn._stem_pool_s2d4(stem, x)
    assert stats is None
    from helpers import assert_close
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_stem_pool_s2d4_train_stats_match():
    from latent2im_tpu.models import resnet as rn

    rng = np.random.RandomState(4)
    stem = rn.init_conv_bn(jax.random.PRNGKey(1), 7, 7, 3, 8)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))

    pre = rn.conv2d(stem["w"], x, stride=2, padding=3)
    want, want_stats = rn.batch_norm(stem, pre, train=True)
    want = rn.max_pool(jax.nn.relu(want))

    got, stats = rn._stem_pool_s2d4(stem, x, train=True)
    from helpers import assert_close
    assert_close(got, want, rtol=2e-4, atol=2e-4)
    assert_close(stats["mean"], want_stats["mean"], rtol=2e-4, atol=2e-5,
                 tpu_rtol=2e-3, tpu_atol=2e-3)
    assert_close(stats["var"], want_stats["var"], rtol=2e-4, atol=2e-5,
                 tpu_rtol=2e-3, tpu_atol=2e-3)
