"""Parity tests: s2d-resident fast tail vs the standard synthesis path."""

import numpy as np

from helpers import assert_close
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.models import stylegan2_fast as fast
from latent2im_tpu.ops import upfirdn2d_mod as ufd


def test_up_modconv_s2d_matches_standard():
    key = jax.random.PRNGKey(0)
    p = sg2.init_modulated_conv(key, 16, 8, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6, 16))
    style = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    want = sg2.modulated_conv2d(p, x, style, up=True)  # [2, 12, 12, 8]
    got2 = fast.up_modconv_s2d(p, x, style)            # [2, 6, 6, 32]
    got = fast.depth_to_space(got2)
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_modconv3x3_s2d_matches_standard():
    key = jax.random.PRNGKey(3)
    p = sg2.init_modulated_conv(key, 8, 8, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 8))
    style = jax.random.normal(jax.random.PRNGKey(5), (2, 32))
    want = sg2.modulated_conv2d(p, x, style)
    got = fast.depth_to_space(
        fast.modconv3x3_s2d(p, sg2._space_to_depth(x), style)
    )
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_to_rgb_s2d_matches_standard():
    key = jax.random.PRNGKey(6)
    p = sg2.init_to_rgb(key, 8, 32)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 8))
    style = jax.random.normal(jax.random.PRNGKey(8), (2, 32))
    want = sg2.to_rgb(p, x, style)  # no skip
    got = fast.depth_to_space(
        fast.to_rgb_s2d(p, sg2._space_to_depth(x), style)
    )
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_upsample_skip_s2d_matches_upfirdn():
    skip = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 3))
    k = ufd.make_kernel(list(sg2.BLUR_KERNEL))
    want = ufd.upsample2d(skip, k)
    got = fast.depth_to_space(fast.upsample_skip_s2d(skip))
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_final_block_s2d_matches_standard():
    """The whole fast tail vs running the standard last block."""
    key = jax.random.PRNGKey(10)
    k1, k2, k3 = jax.random.split(key, 3)
    conv_up = sg2.init_styled_conv(k1, 16, 8, 3, 32, upsample=True)
    conv = sg2.init_styled_conv(k2, 8, 8, 3, 32)
    torgb = sg2.init_to_rgb(k3, 8, 32)
    # nonzero noise weights so the noise path is exercised
    conv_up["noise_w"] = jnp.asarray(0.3)
    conv["noise_w"] = jnp.asarray(0.2)

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8, 8, 16))
    skip = jax.random.normal(jax.random.PRNGKey(12), (2, 8, 8, 3))
    lat = jax.random.normal(jax.random.PRNGKey(13), (2, 3, 32))
    n1 = jax.random.normal(jax.random.PRNGKey(14), (2, 16, 16, 1))
    n2 = jax.random.normal(jax.random.PRNGKey(15), (2, 16, 16, 1))

    want_x = sg2.styled_conv(conv_up, x, lat[:, 0], n1, upsample=True)
    want_x = sg2.styled_conv(conv, want_x, lat[:, 1], n2)
    want = sg2.to_rgb(torgb, want_x, lat[:, 2], skip)

    got = fast.final_block_s2d(
        conv_up, conv, torgb, x, skip, lat[:, 0], lat[:, 1], lat[:, 2], n1, n2
    )
    assert_close(got, want, rtol=5e-4, atol=5e-4, tpu_atol=4e-2, tpu_rtol=4e-2)


def test_up_modconv_s2d_in_matches_standard():
    """The chained s2d-INPUT up-conv: feed s2d(x), expect the same result as
    the normal-form fused convT+blur."""
    key = jax.random.PRNGKey(20)
    p = sg2.init_modulated_conv(key, 16, 8, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 8, 8, 16))
    style = jax.random.normal(jax.random.PRNGKey(22), (2, 32))
    want = sg2.modulated_conv2d(p, x, style, up=True)  # [2, 16, 16, 8]
    x2 = sg2._space_to_depth(x)                        # s2d of the 8x8 grid
    got = fast.depth_to_space(fast.up_modconv_s2d_in(p, x2, style))
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_upsample_skip_s2d_in_matches_upfirdn():
    skip = jax.random.normal(jax.random.PRNGKey(23), (2, 8, 8, 3))
    k = ufd.make_kernel(list(sg2.BLUR_KERNEL))
    want = ufd.upsample2d(skip, k)
    got = fast.depth_to_space(
        fast.upsample_skip_s2d_in(sg2._space_to_depth(skip))
    )
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_chain_blocks_s2d_matches_standard():
    """Two chained blocks (entry normal-form, second fully s2d-resident) vs
    the standard path — the 512+1024-res residency of NEXT.md item 1."""
    key = jax.random.PRNGKey(40)
    ks = jax.random.split(key, 6)
    cu1 = sg2.init_styled_conv(ks[0], 16, 8, 3, 32, upsample=True)
    cv1 = sg2.init_styled_conv(ks[1], 8, 8, 3, 32)
    tr1 = sg2.init_to_rgb(ks[2], 8, 32)
    cu2 = sg2.init_styled_conv(ks[3], 8, 8, 3, 32, upsample=True)
    cv2 = sg2.init_styled_conv(ks[4], 8, 8, 3, 32)
    tr2 = sg2.init_to_rgb(ks[5], 8, 32)
    for c, v in ((cu1, 0.3), (cv1, 0.2), (cu2, 0.25), (cv2, 0.15)):
        c["noise_w"] = jnp.asarray(v)

    x = jax.random.normal(jax.random.PRNGKey(41), (2, 8, 8, 16))
    skip = jax.random.normal(jax.random.PRNGKey(42), (2, 8, 8, 3))
    lat = jax.random.normal(jax.random.PRNGKey(43), (2, 5, 32))
    noises = [
        jax.random.normal(jax.random.PRNGKey(50 + i), (2, r, r, 1))
        for i, r in enumerate((16, 16, 32, 32))
    ]

    h = sg2.styled_conv(cu1, x, lat[:, 0], noises[0], upsample=True)
    h = sg2.styled_conv(cv1, h, lat[:, 1], noises[1])
    s = sg2.to_rgb(tr1, h, lat[:, 2], skip)
    h = sg2.styled_conv(cu2, h, lat[:, 2], noises[2], upsample=True)
    h = sg2.styled_conv(cv2, h, lat[:, 3], noises[3])
    want = sg2.to_rgb(tr2, h, lat[:, 4], s)

    got = fast.chain_blocks_s2d(
        [(cu1, cv1, tr1), (cu2, cv2, tr2)], x, skip, lat, noises
    )
    assert_close(got, want, rtol=8e-4, atol=8e-4, tpu_atol=4e-2, tpu_rtol=4e-2)


def test_modconv3x3_s2d_split_matches():
    key = jax.random.PRNGKey(30)
    p = sg2.init_modulated_conv(key, 8, 8, 3, 32)
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 8, 8, 8))
    style = jax.random.normal(jax.random.PRNGKey(32), (2, 32))
    want = fast.depth_to_space(
        fast.modconv3x3_s2d(p, sg2._space_to_depth(x), style)
    )
    got = fast.depth_to_space(
        fast.modconv3x3_s2d_split(p, sg2._space_to_depth(x), style)
    )
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_to_rgb_skip_shift_branch_matches_upfirdn():
    """to_rgb's high-res skip upsample (shift form) == the depthwise upfirdn
    it replaces (SKIP_SHIFT_MIN_RES gate)."""
    key = jax.random.PRNGKey(60)
    r = sg2.SKIP_SHIFT_MIN_RES  # the gate checks the upsample INPUT res
    p = sg2.init_to_rgb(key, 8, 32)
    x = jax.random.normal(jax.random.PRNGKey(61), (1, 2 * r, 2 * r, 8))
    style = jax.random.normal(jax.random.PRNGKey(62), (1, 32))
    skip = jax.random.normal(jax.random.PRNGKey(63), (1, r, r, 3))
    got = sg2.to_rgb(p, x, style, skip)            # shift branch (impl=None)
    base = sg2.modulated_conv2d(p["conv"], x, style, demodulate=False)
    base = base + p["b"]
    k = ufd.make_kernel(list(sg2.BLUR_KERNEL))
    want = base + ufd.upsample2d(skip, k)
    assert_close(got, want, rtol=2e-4, atol=2e-4)
