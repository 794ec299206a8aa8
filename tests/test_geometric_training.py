"""Geometric (steerability-lineage) training path: masked-L2 against warped
targets, host target generation + jitted step."""

import numpy as np

import jax
import jax.numpy as jnp

from latent2im_tpu.engine.editor import Editor, EditorConfig
from latent2im_tpu.engine.train import make_geometric_train_step, make_optimizer
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.tasks.transforms import get_task
from latent2im_tpu.walks import init_walk

TINY = {4: 16, 8: 16, 16: 8, 32: 8}


def test_geometric_training_loop_reduces_loss():
    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("zoom",), attr_idx=(0,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=4))
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["zoom"])
    task = get_task("zoom", img_size=32)

    opt = make_optimizer(5e-3)
    state = opt.init(walk)
    step = make_geometric_train_step(ed, opt)

    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(4, 32), jnp.float32)
    latent = ed.get_w(z)
    synth = jax.jit(ed.synthesize)

    losses = []
    for i in range(20):
        img_org = np.asarray(synth(latent))
        alpha_graph, alpha_target = task.train_alpha_np(rng, 4)
        target, mask = task.get_target_np(img_org, alpha_target)
        walk, state, m = step(
            walk, state, z, jnp.asarray(alpha_graph),
            jnp.asarray(target, jnp.float32), jnp.asarray(mask, jnp.float32),
        )
        losses.append(float(m["loss"]))

    assert all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_geometric_loop_resume_matches_uninterrupted():
    """start_epoch/opt_state resume reproduces the uninterrupted run exactly
    (per-epoch reseeded z and alpha streams make the split deterministic)."""
    from latent2im_tpu.engine.train import geometric_train_loop

    key = jax.random.PRNGKey(3)
    kg, kw = jax.random.split(key)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("zoom",), attr_idx=(0,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(jax.random.PRNGKey(9),
                                                    num_outputs=4))
    task = get_task("zoom", img_size=32)
    kwargs = dict(num_samples=4, batch_size=2, lr=5e-3, seed=7, log_every=1)

    walk0 = init_walk(kw, "linear_w", 32, cfg.n_latent, ["zoom"])
    w_full, h_full = geometric_train_loop(
        ed, task, jax.tree_util.tree_map(jnp.copy, walk0), n_epochs=2,
        **kwargs)

    states = {}
    w1, h1 = geometric_train_loop(
        ed, task, jax.tree_util.tree_map(jnp.copy, walk0), n_epochs=1,
        on_epoch_end=lambda e, wp, st: states.update(st=st), **kwargs)
    w2, h2 = geometric_train_loop(
        ed, task, w1, n_epochs=2, start_epoch=1, opt_state=states["st"],
        **kwargs)

    from helpers import assert_close

    assert_close(np.asarray(h1 + h2), np.asarray(h_full), rtol=1e-6)
    assert_close(np.asarray(w2["w"]), np.asarray(w_full["w"]), rtol=1e-6,
                 atol=1e-7)
