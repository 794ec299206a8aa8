"""Per-transform alpha semantics: training samplers + test/vis schedules.

Re-creates the mixin layer of the reference (utils/transforms.py:634-920 and
graphs/*/transform_op.py): each task defines how training targets are sampled,
how a scalar test alpha maps to the graph input, and the test/vis linspaces.

Two sampler forms are provided:
  * ``train_alpha(key, batch, n_attr)``    — jax.random, device-side, usable
    inside the jitted train step (per-step key folds keep determinism);
  * ``train_alpha_np(rng, batch, n_attr)`` — numpy RandomState, bit-matching
    the reference's host sampling statistics for parity runs.

Both return (alpha_for_graph [B, A], alpha_for_target [A]) — one draw shared
across the batch, exactly like the reference (utils/transforms.py:658-663).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class Task:
    """Base: uniform alpha in [lo, hi]."""

    lo: float = 0.0
    hi: float = 1.0

    def __init__(self, walk_type: str = "linear", nsliders: int = 1):
        self.walk_type = walk_type
        self.nsliders = nsliders

    # -- training ----------------------------------------------------------
    def train_alpha(self, key, batch: int, n_attr: int):
        a = jax.random.uniform(key, (n_attr,), jnp.float32, self.lo, self.hi)
        slider = jnp.ones((batch, n_attr), jnp.float32) * a
        return slider, a

    def train_alpha_np(self, rng: np.random.RandomState, batch: int, n_attr: int):
        a = rng.uniform(self.lo, self.hi, n_attr).astype(np.float32)
        slider = np.ones((batch, n_attr), np.float32) * a
        return slider, a

    # -- inference ---------------------------------------------------------
    def scale_test_alpha(self, alpha: float, batch: int, n_sliders: int | None = None):
        n = n_sliders or self.nsliders
        return np.full((batch, n), alpha, np.float32)

    def test_alphas(self):
        return np.linspace(0, 1, 10)

    def vis_alphas(self, num_panels: int):
        return np.linspace(0, 1, num_panels)


class FaceTransform(Task):
    """CelebA attributes: alpha ~ U(0,1)^A (utils/transforms.py:634-691)."""

    lo, hi = 0.0, 1.0

    def test_alphas(self):
        if self.walk_type == "linear":
            return np.linspace(0, 1, 10)
        raise ValueError("face test_alphas defined for linear walks only")


class SceneTransform(Task):
    """Transient scene attributes: alpha ~ U(-1,1)^A (transforms.py:694-735)."""

    lo, hi = -1.0, 1.0


class XrayTransform(Task):
    """CheXpert-style attributes: alpha ~ U(0,1)^A (transforms.py:864-920)."""

    lo, hi = 0.0, 1.0

    def test_alphas(self):
        return np.linspace(0, 1, 9)


class ChairTransform(Task):
    lo, hi = -1.0, 1.0


class DspritesTransform(Task):
    """Composes scale/x/y/posx/posy sliders (transforms.py:785-861)."""

    lo, hi = -1.0, 1.0


TASKS = {
    "face": FaceTransform,
    "scene": SceneTransform,
    "xray": XrayTransform,
    "chair": ChairTransform,
    "dsprites": DspritesTransform,
}


def get_task(transform: str, walk_type: str = "linear", nsliders: int = 1) -> Task:
    if transform not in TASKS:
        raise KeyError(
            f"unknown transform '{transform}' (have {sorted(TASKS)}); "
            "geometric/color transforms live in tasks/geometric.py"
        )
    return TASKS[transform](walk_type=walk_type, nsliders=nsliders)
