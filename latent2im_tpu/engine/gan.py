"""GAN module containers, EMA, and joint fine-tuning (``--updateGAN``).

The reference holds netG/netD plus Adam optimizers and an EMA shadow
(``g_running``, decay 0.999) in small wrapper classes
(graphs/stylegan_v2_real/stylegan2.py:19-64, graphs/pggan/pggan_256.py:11-51)
but joint GAN training is UNIMPLEMENTED there — train.py:40-41 raises, and
the machinery survives only as commented-out WGAN-GP code (pggan
transform_base.py:413-471). This module provides the containers plus working
jitted update steps matching that dead code's semantics:

  D step: mean(D(fake)) - mean(D(real)) + 0.001*mean(D(real)^2) drift
          + 10 * gradient penalty on eps-interpolated samples
  G step: BCEWithLogits(D(G(z)), 1) + LAMBDA * masked edit loss (optional)
  EMA accumulate on G after each G step (decay 0.999).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def ema_accumulate(shadow, params, decay: float = 0.999):
    """shadow = decay * shadow + (1 - decay) * params  (stylegan2.py:9-16)."""
    return jax.tree_util.tree_map(
        lambda s, p: s * decay + p * (1.0 - decay), shadow, params
    )


@dataclasses.dataclass
class GANModule:
    """netG/netD params + optimizers + EMA shadow (g_running)."""

    g_params: Any
    d_params: Any = None
    g_running: Any = None
    g_opt: optax.GradientTransformation | None = None
    d_opt: optax.GradientTransformation | None = None
    g_opt_state: Any = None
    d_opt_state: Any = None

    @classmethod
    def create(cls, g_params, d_params=None, lr: float = 1e-4,
               betas: tuple[float, float] = (0.0, 0.999)):
        """Adam betas (0, 0.999) per stylegan2.py:30-36; pggan uses
        (0.5, 0.999) (pggan_256.py:23-29)."""
        g_opt = optax.adam(lr, b1=betas[0], b2=betas[1])
        mod = cls(
            g_params=g_params,
            d_params=d_params,
            g_running=jax.tree_util.tree_map(lambda x: x, g_params),
            g_opt=g_opt,
            g_opt_state=g_opt.init(g_params),
        )
        if d_params is not None:
            mod.d_opt = optax.adam(lr, b1=betas[0], b2=betas[1])
            mod.d_opt_state = mod.d_opt.init(d_params)
        return mod

    def accumulate(self, decay: float = 0.999):
        self.g_running = ema_accumulate(self.g_running, self.g_params, decay)


def make_gan_update_steps(
    g_apply: Callable,
    d_apply: Callable,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    gp_weight: float = 10.0,
    drift: float = 0.001,
    edit_weight: float = 0.1,
    ema_decay: float = 0.999,
):
    """-> (d_step, g_step), both jitted.

    g_apply(g_params, z) -> images; d_apply(d_params, images) -> logits [B]
    (or [B,1]). Semantics mirror the reference's commented WGAN-GP update
    (pggan transform_base.py:413-471): drift-regularized Wasserstein D loss
    with an eps-line gradient penalty, and a G step on
    BCEWithLogits(D(fake), 1) plus an optional masked pixel edit loss
    weighted by LAMBDA (=0.1, pggan constants).
    """

    def _d_loss(d_params, g_params, z, real, key):
        fake = jax.lax.stop_gradient(g_apply(g_params, z))
        d_real = d_apply(d_params, real).reshape(-1)
        d_fake = d_apply(d_params, fake).reshape(-1)
        loss = jnp.mean(d_fake) - jnp.mean(d_real) + drift * jnp.mean(d_real**2)

        eps = jax.random.uniform(key, (real.shape[0], 1, 1, 1))
        x_hat = eps * real + (1.0 - eps) * fake

        def d_sum(xh):
            return jnp.sum(d_apply(d_params, xh))

        grads = jax.grad(d_sum)(x_hat)
        norms = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
        gp = jnp.mean((norms - 1.0) ** 2)
        return loss + gp_weight * gp, {"d_loss": loss, "grad_penalty": gp}

    @jax.jit
    def d_step(d_params, d_opt_state, g_params, z, real, key):
        (_, metrics), grads = jax.value_and_grad(_d_loss, has_aux=True)(
            d_params, g_params, z, real, key
        )
        updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
        return optax.apply_updates(d_params, updates), d_opt_state, metrics

    def _g_loss(g_params, d_params, z, target, mask):
        fake = g_apply(g_params, z)
        logits = d_apply(d_params, fake).reshape(-1)
        loss = jnp.mean(jax.nn.softplus(-logits))  # BCEWithLogits vs ones
        if target is not None:
            diff = (fake - target) * mask
            loss = loss + edit_weight * jnp.sum(diff * diff) / jnp.sum(mask)
        return loss, {"g_loss": loss}

    @jax.jit
    def g_step(g_params, g_opt_state, g_running, d_params, z, target, mask):
        (_, metrics), grads = jax.value_and_grad(_g_loss, has_aux=True)(
            g_params, d_params, z, target, mask
        )
        updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, updates)
        g_running = ema_accumulate(g_running, g_params, ema_decay)
        return g_params, g_opt_state, g_running, metrics

    return d_step, g_step
