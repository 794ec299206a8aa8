"""--trainEmbed discrete-embedding training: per-step bank-index sampling
must reach and train the SAMPLED bank entries (not just index 0), matching
the reference's WalkEmbed semantics (transform_base.py:21-41 + the
transforms' trainEmbed branches in utils/transforms.py:647-656)."""

import numpy as np
import pytest

import jax

from latent2im_tpu.config.options import TrainOptions
from latent2im_tpu.engine.build import build_editor_from_options
from latent2im_tpu.engine.train import _alpha_seed, train_loop
from latent2im_tpu.tasks.transforms import FaceTransform, get_task
from latent2im_tpu.tasks.geometric import ShiftXTransform, ZoomTransform


def _tiny_embed_editor():
    opt = TrainOptions().parse(
        [
            "--model", "stylegan_v2_real", "--transform", "face",
            "--walk_type", "linear", "--trainEmbed",
            "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", "/tmp/l2i_embed_test", "--overwrite_config",
            "--dev_tiny", "--resolution", "32", "--no_gan_loss",
            "--no_content_loss",
        ],
        print_opt=False,
    )
    return build_editor_from_options(opt)


def test_embed_sampler_three_tuple():
    rng = np.random.RandomState(0)
    task = FaceTransform(nsliders=1)
    slider, alpha_val, index = task.train_alpha_embed_np(rng, batch=3)
    assert slider.shape == (3, 1)
    assert 0 <= index < task.num_panel
    np.testing.assert_allclose(slider, np.full((3, 1), alpha_val))
    # distinct draws hit distinct indices
    idxs = {task.train_alpha_embed_np(rng, 1)[2] for _ in range(50)}
    assert len(idxs) > 1


def test_embed_ladders_match_reference():
    # zoom: exp ladder, log slider (transforms.py:142, 211-222)
    z = ZoomTransform()
    np.testing.assert_allclose(
        z.embedding_alphas(),
        np.exp(np.linspace(np.log(0.5), np.log(2), 15)),
    )
    s, a, i = z.train_alpha_embed_np(np.random.RandomState(1), 2)
    np.testing.assert_allclose(s, np.full((2, 1), np.log(a)), rtol=1e-6)
    # shift: linspace(-7, 7, 15), slider scaled by embed_alpha_max
    sx = ShiftXTransform()
    np.testing.assert_allclose(sx.embedding_alphas(), np.linspace(-7, 7, 15))
    s, a, i = sx.train_alpha_embed_np(np.random.RandomState(1), 2)
    np.testing.assert_allclose(s, np.full((2, 1), a / 7.0), rtol=1e-6)


def test_compat_get_train_alpha_train_embed():
    from latent2im_tpu import compat

    editor, walk, info = _tiny_embed_editor()
    task = get_task("face", nsliders=1)
    g = compat.CompatGraph(editor, task, walk, info, seed=3)
    zs = np.zeros((4, editor.cfg.dim_z), np.float32)
    slider, alpha_val, index = g.get_train_alpha(zs, trainEmbed=True)
    assert slider.shape == (4, 1)
    assert isinstance(index, int) and 0 <= index < task.num_panel
    # non-embed call keeps the (graph, target, None) contract
    a_g, a_t, idx = g.get_train_alpha(zs, trainEmbed=False)
    assert idx is None


def test_embed_inference_paths_fail_loudly():
    """Alpha-driven inference over an alpha-less walk must raise, not render
    P identical bank-0 panels. The reference has no working inference path
    for WalkEmbed either: its w-path drops name/index_ before the walk call
    (transform_base.py:381-387) and its z-path with the vis default
    index_=None broadcasts shape garbage (transform_base.py:35-41)."""
    from latent2im_tpu import compat

    editor, walk, info = _tiny_embed_editor()
    task = get_task("face", nsliders=1)
    z = np.zeros((2, editor.cfg.dim_z), np.float32)
    alpha = np.full((2, 1), 0.7, np.float32)

    with pytest.raises(ValueError, match="embed"):
        editor.apply_alpha(walk, z, alpha)
    with pytest.raises(ValueError, match="embed"):
        editor.sweep(walk, z, np.full((3, 2), 0.5, np.float32))

    g = compat.CompatGraph(editor, task, walk, info, seed=0)
    with pytest.raises(ValueError, match="index_"):
        g.get_z_new_tensor(z, alpha)  # missing bank index
    # an explicit bank index applies that entry
    z_new = np.asarray(g.get_z_new_tensor(z, alpha, name="Smiling", index_=3))
    bank = np.asarray(walk["w"]["Smiling"])
    np.testing.assert_allclose(
        z_new, z + bank[3, 0].sum(axis=-1)[None, :], rtol=1e-6
    )


@pytest.mark.slow
def test_train_embed_trains_sampled_bank_entries():
    editor, walk, info = _tiny_embed_editor()
    assert editor.cfg.walk_kind == "embed"
    task = get_task("face", nsliders=1)

    num_samples, batch = 8, 2
    w0 = np.array(walk["w"]["Smiling"])
    walk_out, history = train_loop(
        editor, task, walk,
        num_samples=num_samples, batch_size=batch, n_epochs=1, lr=1e-2,
        seed=0, log_every=1,
    )
    assert all(np.isfinite(h) for h in history)
    w1 = np.array(walk_out["w"]["Smiling"])

    # replay the loop's host sampling stream to know which bank indices the
    # 4 steps trained
    rng = np.random.RandomState(_alpha_seed(0, 0))
    sampled = {task.train_alpha_embed_np(rng, batch, 1)[2]
               for _ in range(num_samples // batch)}
    moved = {i for i in range(task.num_panel)
             if not np.allclose(w1[i], w0[i])}
    assert moved == sampled, (moved, sampled)
    # the run must demonstrate discrete-index coverage beyond bank entry 0
    assert any(i != 0 for i in moved)
