"""Joint GAN fine-tuning (updateGAN) steps: WGAN-GP D update + G update."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from latent2im_tpu.engine.gan import GANModule, make_gan_update_steps
from latent2im_tpu.models import stylegan2 as sg2

TINY = {4: 8, 8: 8, 16: 8}
SIZE, STYLE = 16, 16


def _setup():
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g = sg2.init_generator(kg, SIZE, style_dim=STYLE, n_mlp=2, channels=TINY)
    d = sg2.init_discriminator(kd, SIZE, channels=TINY)

    def g_apply(gp, z):
        return sg2.generator_forward(gp, z)

    def d_apply(dp, img):
        return sg2.discriminator_forward(dp, img)

    return g, d, g_apply, d_apply


def test_gan_steps_move_params_and_stay_finite():
    g, d, g_apply, d_apply = _setup()
    mod = GANModule.create(g, d_params=d, lr=1e-4)
    d_step, g_step = make_gan_update_steps(
        g_apply, d_apply, mod.g_opt, mod.d_opt
    )

    z = jax.random.normal(jax.random.PRNGKey(1), (4, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(2), (4, SIZE, SIZE, 3)) * 0.5

    d0 = np.asarray(mod.d_params["final_lin2"]["w"]).copy()
    mod.d_params, mod.d_opt_state, dm = d_step(
        mod.d_params, mod.d_opt_state, mod.g_params, z, real, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(dm["d_loss"])) and np.isfinite(float(dm["grad_penalty"]))
    assert not np.allclose(np.asarray(mod.d_params["final_lin2"]["w"]), d0)

    g0 = np.asarray(mod.g_params["conv1"]["conv"]["w"]).copy()
    ema0 = np.asarray(mod.g_running["conv1"]["conv"]["w"]).copy()
    mod.g_params, mod.g_opt_state, mod.g_running, gm = g_step(
        mod.g_params, mod.g_opt_state, mod.g_running, mod.d_params, z, None, None
    )
    assert np.isfinite(float(gm["g_loss"]))
    assert not np.allclose(np.asarray(mod.g_params["conv1"]["conv"]["w"]), g0)
    # EMA moved a little toward the new params but is not equal to them
    ema1 = np.asarray(mod.g_running["conv1"]["conv"]["w"])
    assert not np.allclose(ema1, ema0)
    assert not np.allclose(ema1, np.asarray(mod.g_params["conv1"]["conv"]["w"]))


def test_d_loss_decreases_on_real_vs_fake():
    """A few WGAN-GP D steps on fixed real/fake distributions must push the
    Wasserstein D loss (mean D(fake) - mean D(real)) down."""
    g, d, g_apply, d_apply = _setup()
    mod = GANModule.create(g, d_params=d, lr=2e-3)
    d_step, _ = make_gan_update_steps(g_apply, d_apply, mod.g_opt, mod.d_opt)

    z = jax.random.normal(jax.random.PRNGKey(1), (8, STYLE))
    real = jax.random.normal(jax.random.PRNGKey(2), (8, SIZE, SIZE, 3)) * 0.5

    losses = []
    for i in range(12):
        mod.d_params, mod.d_opt_state, dm = d_step(
            mod.d_params, mod.d_opt_state, mod.g_params, z, real,
            jax.random.PRNGKey(100 + i),
        )
        losses.append(float(dm["d_loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_gan_fake_path_accepts_batch_pytree():
    """The CLI's --updateGAN feeds a pytree batch (z + walk + alpha + reg)
    through g_apply; the update steps must be agnostic to the z argument's
    structure."""
    from latent2im_tpu.walks import init_walk

    g, d, _, d_apply = _setup()
    walk = init_walk(jax.random.PRNGKey(5), "linear_w", STYLE,
                     sg2.n_latent(SIZE), ["Smiling"])

    def g_apply(gp, batch):
        w = sg2.style_forward(gp, batch["z"])
        latent = jnp.repeat(w[:, None, :], sg2.n_latent(SIZE), axis=1)
        from latent2im_tpu.walks import apply_walk

        latent = apply_walk("linear_w", batch["walk"], latent, batch["alpha"])
        return sg2.synthesize(gp, latent)

    mod = GANModule.create(g, d_params=d, lr=1e-4)
    d_step, g_step = make_gan_update_steps(g_apply, d_apply, mod.g_opt, mod.d_opt)
    batch = {
        "z": jax.random.normal(jax.random.PRNGKey(1), (2, STYLE)),
        "walk": walk,
        "alpha": jnp.full((2, 1), 0.5),
    }
    real = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3)) * 0.5
    mod.d_params, mod.d_opt_state, dm = d_step(
        mod.d_params, mod.d_opt_state, mod.g_params, batch, real,
        jax.random.PRNGKey(3),
    )
    _, _, _, gm = g_step(
        mod.g_params, mod.g_opt_state, mod.g_running, mod.d_params, batch,
        None, None,
    )
    assert np.isfinite(float(dm["d_loss"])) and np.isfinite(float(gm["g_loss"]))


def test_gan_g_step_with_edit_target():
    g, d, g_apply, d_apply = _setup()
    mod = GANModule.create(g, d_params=d, lr=1e-4)
    _, g_step = make_gan_update_steps(g_apply, d_apply, mod.g_opt, mod.d_opt)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, STYLE))
    target = jnp.zeros((2, SIZE, SIZE, 3))
    mask = jnp.ones((2, SIZE, SIZE, 3))
    _, _, _, gm = g_step(
        mod.g_params, mod.g_opt_state, mod.g_running, mod.d_params, z, target, mask
    )
    assert np.isfinite(float(gm["g_loss"]))
