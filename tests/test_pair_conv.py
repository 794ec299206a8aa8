"""Pair-lane fused styled-conv (ops/pair_conv.py) value parity vs the XLA
composition — interpreter mode on CPU, the same gate every Pallas kernel in
the repo passes before touching the chip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import ON_CPU, assert_close

from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.ops import pair_conv as pcv


def _setup(b=2, hw=32, c=64, seed=0):
    key = jax.random.PRNGKey(seed)
    kp, kx, ks, kn = jax.random.split(key, 4)
    p = sg2.init_styled_conv(kp, c, c, 3, style_dim=32)
    p["noise_w"] = jnp.asarray(0.7, jnp.float32)  # nonzero: exercise noise
    p["act_b"] = jax.random.normal(kn, (c,)) * 0.1
    x = jax.random.normal(kx, (b, hw, hw, c), jnp.float32)
    style = jax.random.normal(ks, (b, 32), jnp.float32)
    return p, x, style


@pytest.mark.parametrize("noise_batch", [1, 2])
def test_pair_conv_matches_xla_styled_conv(noise_batch):
    p, x, style = _setup()
    noise = jax.random.normal(jax.random.PRNGKey(9),
                              (noise_batch, 32, 32, 1), jnp.float32)
    want = sg2.styled_conv(p, x, style, noise)  # XLA composition
    got = sg2._styled_conv_pair(p, x, style, noise)
    # CPU interpreter: strict; real chip: bf16x3-vs-f32-MXU tolerance
    assert_close(got, want, rtol=2e-4, atol=2e-4)


def test_pair_blocks_zero_structure():
    """Half the block entries are structural zeros; the nonzero ones map
    exactly to the dense taps (mapping in the module docstring)."""
    w = jnp.arange(3 * 3 * 4 * 4, dtype=jnp.float32).reshape(3, 3, 4, 4) + 1
    blk = np.asarray(pcv.build_pair_blocks(w))
    assert blk.shape == (3, 3, 8, 8)
    nz = (blk != 0).sum()
    assert nz == 3 * 6 * 4 * 4  # 6 valid (dpx, pi, po) combos per row tap
    # spot-check one mapping: dpx=0, pi=1, po=0 -> dx = 1
    np.testing.assert_array_equal(blk[:, 1, 4:8, 0:4], np.asarray(w)[:, 2])


def test_dispatch_gate():
    assert pcv.pair_conv_supported((1, 512, 512, 64), 3, False, False)
    assert not pcv.pair_conv_supported((1, 512, 512, 64), 1, False, False)
    assert not pcv.pair_conv_supported((1, 256, 256, 64), 3, False, False)
    assert not pcv.pair_conv_supported((1, 512, 512, 128), 3, False, False)
    assert not pcv.pair_conv_supported((1, 512, 512, 64), 3, True, False)


def test_synthesize_with_pair_conv_flag_matches():
    """Full tiny synthesis with PAIR_CONV on == off (gate only engages at
    >=512 res in production; force a low threshold here)."""
    if not ON_CPU:
        pytest.skip("tiny channels give <128 lanes; hardware path needs "
                    "the production 64-channel shape (covered above)")
    key = jax.random.PRNGKey(1)
    tiny = {4: 16, 8: 16, 16: 8, 32: 8}
    g = sg2.init_generator(key, 32, style_dim=32, n_mlp=2, channels=tiny)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    want = sg2.generator_forward(g, z)
    old_res, old_flag = pcv_min_res(), sg2.PAIR_CONV
    try:
        _set_pcv_min_res(16)
        sg2.PAIR_CONV = True
        got = sg2.generator_forward(g, z)
    finally:
        _set_pcv_min_res(old_res)
        sg2.PAIR_CONV = old_flag
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def pcv_min_res():
    return pcv.pair_conv_supported.__defaults__[0]


def _set_pcv_min_res(v):
    pcv.pair_conv_supported.__defaults__ = (
        v, pcv.pair_conv_supported.__defaults__[1]
    )
