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


def test_save_path_gan_roundtrip(tmp_path):
    """The --updateGAN fine-tuned GAN checkpoint loads back (structure-free
    msgpack restore, lists re-materialized) and prefers the EMA g_running."""
    import jax

    from latent2im_tpu.io import checkpoint as ckpt
    from latent2im_tpu.models import stylegan2 as sg2

    tiny = {4: 8, 8: 8, 16: 8}
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = sg2.init_generator(kg, 16, style_dim=16, n_mlp=2, channels=tiny)
    d = sg2.init_discriminator(kd, 16, channels=tiny)
    g_run = jax.tree_util.tree_map(lambda x: x * 0.5, g)
    path = str(tmp_path / "model_gan_1_final.ckpt")
    ckpt.save_pytree(path, {"g": g, "g_running": g_run, "d": d})

    g2, d2 = ckpt.load_gan_checkpoint(path)
    assert isinstance(g2["convs"], list) and isinstance(g2["style"], list)
    np.testing.assert_allclose(
        np.asarray(g2["conv1"]["conv"]["w"]),
        np.asarray(g_run["conv1"]["conv"]["w"]),
    )
    assert d2 is not None
    # the restored tree must run through the generator
    img = sg2.generator_forward(g2, jax.random.normal(jax.random.PRNGKey(1), (1, 16)))
    assert img.shape == (1, 16, 16, 3)


def test_reg_input_size_resizes_before_regression():
    import dataclasses

    import jax

    from latent2im_tpu.engine.editor import Editor, EditorConfig, _bilinear_resize
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2

    tiny = {4: 8, 8: 8, 16: 8, 32: 8}
    kg, kr = jax.random.split(jax.random.PRNGKey(0))
    g = sg2.init_generator(kg, 32, style_dim=16, n_mlp=2, channels=tiny)
    reg = rn.init_resnet50(kr, num_outputs=4)
    cfg = EditorConfig(attr_list=("A",), attr_idx=(0,), size=32, dim_z=16,
                       reg_input_size=16)
    ed = Editor(cfg, g, reg_params=reg)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    got = ed.regress_all(img)
    ed_plain = Editor(dataclasses.replace(cfg, reg_input_size=None), g,
                      reg_params=reg)
    want = ed_plain.regress_all(_bilinear_resize(img, 16, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
    # and a no-op when sizes already match
    same = ed_plain.regress_all(img)
    assert same.shape == (2, 4)


def test_load_gan_checkpoint_rejects_non_stylegan_torch_dict(tmp_path):
    """A torch checkpoint without rosinality to_rgbs keys raises a clear
    error instead of silently inferring size=4 (ADVICE r2)."""
    import pytest
    import torch

    from latent2im_tpu.io import checkpoint as ckpt

    path = str(tmp_path / "weird.pt")
    torch.save({"g_ema": {"some.linear.weight": torch.zeros(3, 3)}}, path)
    with pytest.raises(ValueError, match="to_rgbs"):
        ckpt.load_gan_checkpoint(path)


def test_relistify_scoped_to_list_keys():
    """Digit-keyed dicts OUTSIDE the known list-bearing keys survive a
    structure-free restore as dicts (ADVICE r2: per-attribute banks named
    '0','1' must not be silently restructured)."""
    from latent2im_tpu.io import checkpoint as ckpt

    tree = {
        "convs": {"0": {"w": 1}, "1": {"w": 2}},       # real list, restored
        "banks": {"0": [1.0], "1": [2.0]},              # genuine digit keys
    }
    out = ckpt._relistify(tree)
    assert isinstance(out["convs"], list) and len(out["convs"]) == 2
    assert isinstance(out["banks"], dict) and set(out["banks"]) == {"0", "1"}


def test_gan_resume_checkpoint_carries_optimizer_state(tmp_path):
    """_save_gan writes Adam states and the structure-full restore returns
    them exactly (ADVICE r2: bit-reproducible --updateGAN resume)."""
    import jax

    from latent2im_tpu.cli.train import _save_gan
    from latent2im_tpu.engine.gan import GANModule
    from latent2im_tpu.io import checkpoint as ckpt
    from latent2im_tpu.models import stylegan2 as sg2

    tiny = {4: 8, 8: 8, 16: 8}
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = sg2.init_generator(kg, 16, style_dim=16, n_mlp=2, channels=tiny)
    d = sg2.init_discriminator(kd, 16, channels=tiny)
    mod = GANModule.create(g, d_params=d, lr=1e-3)
    # make the opt state non-trivial so the roundtrip is meaningful
    mod.g_opt_state = jax.tree_util.tree_map(
        lambda x: x + 1 if hasattr(x, "dtype") else x, mod.g_opt_state
    )
    path = str(tmp_path / "model_gan_resume.ckpt")
    _save_gan(mod, path)

    like = {"g": mod.g_params, "g_running": mod.g_running, "d": mod.d_params,
            "g_opt_state": mod.g_opt_state, "d_opt_state": mod.d_opt_state}
    tree = ckpt.load_pytree(path, like)
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
            tree["g_opt_state"], mod.g_opt_state,
        )
    )
    assert chex
