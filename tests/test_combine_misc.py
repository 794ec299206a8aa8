"""Combined 2-attribute edits, walk-bank merge, EMA, checkpoint resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.engine.editor import Editor, EditorConfig
from latent2im_tpu.engine.gan import GANModule, ema_accumulate
from latent2im_tpu.io import checkpoint as ckpt
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.walks import init_walk

TINY_CHANNELS = {4: 16, 8: 16, 16: 8, 32: 8}
SIZE, STYLE_DIM = 32, 32


@pytest.fixture(scope="module")
def editor2():
    key = jax.random.PRNGKey(0)
    kg, kr = jax.random.split(key)
    g = sg2.init_generator(kg, SIZE, style_dim=STYLE_DIM, n_mlp=2,
                           channels=TINY_CHANNELS)
    r = rn.init_resnet50(kr, num_outputs=40)
    cfg = EditorConfig(
        attr_list=("Smiling", "Young"),
        attr_idx=(31, 39),
        size=SIZE,
        dim_z=STYLE_DIM,
        walk_kind="linear_w",
    )
    return Editor(cfg, g, reg_params=r)


def test_apply_alpha_combine(editor2):
    walk = init_walk(jax.random.PRNGKey(1), "linear_w", STYLE_DIM,
                     editor2.cfg.n_latent, ["Smiling", "Young"])
    z = np.random.RandomState(0).randn(2, STYLE_DIM).astype(np.float32)
    edited, alpha_org, orig = editor2.apply_alpha_combine(
        walk, z, [np.full((2,), 0.9), np.full((2,), 0.1)], indices=[31, 39]
    )
    assert edited.shape == (2, SIZE, SIZE, 3)
    assert alpha_org.shape == (2, 2)
    assert not np.allclose(np.asarray(edited), np.asarray(orig))


def test_sweep_combine_grid(editor2):
    walk = init_walk(jax.random.PRNGKey(1), "linear_w", STYLE_DIM,
                     editor2.cfg.n_latent, ["Smiling", "Young"])
    z = np.random.RandomState(0).randn(1, STYLE_DIM).astype(np.float32)
    imgs, _, _ = editor2.sweep_combine(walk, z, [0.0, 1.0], indices=[31, 39])
    assert imgs.shape == (2, 2, 1, SIZE, SIZE, 3)
    assert not np.allclose(np.asarray(imgs[0, 0]), np.asarray(imgs[1, 1]))


def test_merge_walk_banks():
    base = {"w": np.zeros((2, 4, 8), np.float32)}
    single = {"w": np.ones((1, 4, 8), np.float32) * 3}
    merged = ckpt.merge_walk_banks(base, [("Young", single)], ["Smiling", "Young"])
    assert np.allclose(merged["w"][1], 3)
    assert np.allclose(merged["w"][0], 0)
    with pytest.raises(KeyError):
        ckpt.merge_walk_banks(base, [("Nope", single)], ["Smiling", "Young"])


def test_ema_accumulate():
    p = {"a": jnp.ones((3,))}
    s = {"a": jnp.zeros((3,))}
    out = ema_accumulate(s, p, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, rtol=1e-6)


def test_gan_module_create_and_ema():
    g = {"w": jnp.ones((4,))}
    mod = GANModule.create(g, d_params={"w": jnp.zeros((2,))})
    mod.g_params = {"w": jnp.full((4,), 2.0)}
    mod.accumulate(decay=0.5)
    np.testing.assert_allclose(np.asarray(mod.g_running["w"]), 1.5)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    walk = init_walk(jax.random.PRNGKey(0), "linear_w", 8, 4, ["a"])
    import optax

    opt = optax.adam(1e-3)
    state = opt.init(walk)
    d = str(tmp_path)
    ckpt.save_walk(d, 0, walk, opt_state=state)
    ckpt.save_walk(d, 3, walk, opt_state=state)
    ckpt.save_walk(d, 5, walk, final=True)
    assert ckpt.find_resume(d).endswith("model_w_3_walk_module.ckpt")

    w2, st2, meta = ckpt.load_walk(ckpt.walk_ckpt_path(d, 3), walk,
                                   opt_state_like=state)
    np.testing.assert_allclose(np.asarray(w2["w"]), np.asarray(walk["w"]))
    assert meta["epoch"] == 3
    assert st2 is not None
