"""W+ inversion of real images ("BP" path).

Re-creates BP.py's projector: initialize W+ at mean_latent(4096) tiled to
[B, n_latent, D] (BP.py:112-136), then Adam(lr, betas=(0.5, 0.9)) or SGD
(momentum 0.9) on w for n_loops with

    loss = sum_b [ sum(diff^2)/N_px ]  +  B * mean_b [ gram perceptual ]

where the perceptual term sums squared gram differences at VGG16
relu1_2/2_2/3_3/4_3, each scaled by C^2 (BP.py:75-97, :173-184). The whole
optimize step is one jitted XLA program; the loop stays on device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import stylegan2 as sg2
from ..models import vgg as vggm


def nll_pixel_loss(output, target):
    """Per-sample -log_likelihood/N (BP.py:75-97, 'berboulli' branch)."""
    diff = output - target
    n = output.shape[1] * output.shape[2] * output.shape[3]
    return jnp.sum(diff * diff, axis=(1, 2, 3)) / n


def gram_perceptual_bp(vgg16_params, target, output):
    """Per-sample gram loss, C^2-weighted per tap (BP.py:173-184)."""
    taps = vggm.VGG16_GRAM_TAPS
    f_t = vggm.vgg_features(vgg16_params, target, taps)
    f_o = vggm.vgg_features(vgg16_params, output, taps)
    total = 0.0
    for t in taps:
        gt = vggm.gram_matrix(f_t[t])
        go = vggm.gram_matrix(f_o[t])
        c2 = gt.shape[1] * gt.shape[2]
        total = total + jnp.sum((gt - go) ** 2, axis=(1, 2)) * c2
    return total


def make_inverter(
    g_params,
    vgg16_params,
    n_latent: int,
    lr: float = 1e-4,
    optim: str = "Adam",
    kernel_impl=None,
) -> tuple[Callable, Callable, optax.GradientTransformation]:
    """-> (init_w, step, optimizer). step is jitted:
    step(w, opt_state, target_img) -> (w, opt_state, loss)."""
    if optim == "Adam":
        tx = optax.adam(lr, b1=0.5, b2=0.9)
    elif optim == "GD":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {optim}")

    def init_w(key, batch: int):
        mean = sg2.mean_latent(g_params, key, n=4096)  # [1, D]
        return jnp.tile(mean[:, None, :], (batch, n_latent, 1))

    def loss_fn(w, target):
        output = sg2.synthesize(g_params, w, impl=kernel_impl)
        nll = nll_pixel_loss(output, target)
        p = gram_perceptual_bp(vgg16_params, target, output)
        # (nll + mean(p)).sum() over batch (BP.py:148-152)
        return jnp.sum(nll + jnp.mean(p)), output

    @jax.jit
    def step(w, opt_state, target):
        (loss, output), grads = jax.value_and_grad(loss_fn, has_aux=True)(w, target)
        updates, opt_state = tx.update(grads, opt_state, w)
        w = optax.apply_updates(w, updates)
        return w, opt_state, loss, output

    return init_w, step, tx


def invert(
    g_params,
    vgg16_params,
    target_imgs,
    n_latent: int,
    n_loops: int = 500,
    lr: float = 1e-4,
    optim: str = "Adam",
    key=None,
    on_loop: Callable | None = None,
    show_freq: int = 500,
    inverter=None,
    kernel_impl=None,
):
    """-> (w [B, n_latent, D], final output images, loss history).

    inverter: optional prebuilt (init_w, step, tx) from make_inverter —
    multi-batch callers MUST pass one, or every call re-jits (recompiling the
    full G+VGG graph per batch, ~20s+ each per CLAUDE.md compile budgets)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    init_w, step, tx = inverter or make_inverter(
        g_params, vgg16_params, n_latent, lr, optim, kernel_impl=kernel_impl
    )
    target = jnp.asarray(target_imgs)
    w = init_w(key, target.shape[0])
    opt_state = tx.init(w)
    history = []  # device scalars: appended async, fetched once at the end
    output = None
    for loop in range(1, n_loops + 1):
        w, opt_state, loss, output = step(w, opt_state, target)
        history.append(loss)
        if (loop % show_freq == 0 or loop == n_loops) and on_loop is not None:
            on_loop(loop, float(loss), output)
    # fetch in bounded chunks: one jnp.stack over ALL loops would build an
    # n_loops-operand HLO, and the remote compile tunnel rejects huge
    # payloads (HTTP 413, CLAUDE.md) — a crash at the END of a long run
    # would lose the optimization. 512-operand programs are safely small.
    hist: list[float] = []
    for i in range(0, len(history), 512):
        hist.extend(
            np.asarray(jnp.stack(history[i : i + 512]), np.float64).tolist()
        )
    return w, output, hist
