"""Closed-loop learning test: the walk must actually learn to move the
regressor's score toward the sampled targets (loss decreases substantially),
not merely take finite gradient steps."""

import numpy as np

import jax
import jax.numpy as jnp

from latent2im_tpu.engine.editor import Editor, EditorConfig
from latent2im_tpu.engine.train import make_optimizer, make_train_step
from latent2im_tpu.models import resnet as rn
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.tasks.transforms import get_task
from latent2im_tpu.walks import init_walk

TINY = {4: 16, 8: 16, 16: 8, 32: 8}


def test_walk_training_reduces_reg_loss():
    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    reg = rn.init_resnet50(kr, num_outputs=40)
    cfg = EditorConfig(
        attr_list=("Smiling",),
        attr_idx=(31,),
        size=32,
        dim_z=32,
        walk_kind="linear_w",
        no_content_loss=True,
        no_gan_loss=True,
        stable_bce=True,  # raw BCE is NaN-prone on random towers
    )
    ed = Editor(cfg, g, reg_params=reg)
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["Smiling"])
    task = get_task("face")
    opt = make_optimizer(5e-3)
    state = opt.init(walk)
    step = make_train_step(ed, task, opt)

    z = jnp.asarray(np.random.RandomState(0).randn(8, 32), jnp.float32)
    losses = []
    k0 = jax.random.PRNGKey(1)
    for i in range(60):
        walk, state, m = step(walk, state, z, jax.random.fold_in(k0, i))
        losses.append(float(m["reg_loss"]))

    early = float(np.mean(losses[:10]))
    late = float(np.mean(losses[-10:]))
    assert np.isfinite(late)
    assert late < 0.8 * early, (
        f"walk failed to learn: early reg loss {early:.4f} -> late {late:.4f}"
    )
