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
    # --trainEmbed discrete panel (utils/transforms.py:640-656 and the
    # per-transform ladders): each step samples one index into this ladder
    # and trains that bank entry of the WalkEmbed module.
    num_panel: int = 6
    embed_alpha_max: float = 1.0

    def __init__(self, walk_type: str = "linear", nsliders: int = 1):
        self.walk_type = walk_type
        self.nsliders = nsliders

    def embedding_alphas(self) -> np.ndarray:
        """The discrete trainEmbed alpha ladder (transforms.py:641)."""
        return np.linspace(0.0, 1.0, self.num_panel)

    def train_alpha_embed_np(self, rng: np.random.RandomState, batch: int,
                             n_attr: int | None = None):
        """--trainEmbed sampling (transforms.py:647-656): one discrete panel
        index per step; returns (slider [B, nsliders], alpha_val, index)
        mirroring the reference's 3-tuple. The slider (scaled by
        embed_alpha_max) is the BCE/graph alpha; alpha_val the raw ladder
        value (used by geometric get_target_np); index selects the bank
        entry the step trains."""
        index = int(rng.choice(self.num_panel))
        alpha_val = float(self.embedding_alphas()[index])
        slider = np.full((batch, self.nsliders),
                         alpha_val / self.embed_alpha_max, np.float32)
        return slider, np.float32(alpha_val), index

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
    """Composes per-factor sliders (transforms.py:785-861): 'scale' draws
    from a discrete ladder {0.5..1.0}, 'x' contributes TWO U(-1,1) sliders,
    'posx'/'posy' draw U(0,1). The device-side sampler mirrors the same
    composition for the default 5-slider vocabulary (scale, x, y, posx,
    posy — 'y' contributes no slider of its own, exactly as the reference)."""

    lo, hi = -1.0, 1.0
    SCALE_LADDER = (0.5, 0.6, 0.7, 0.8, 0.9, 1.0)

    def train_alpha(self, key, batch: int, n_attr: int = 5):
        ks = jax.random.split(key, 5)
        ladder = jnp.asarray(self.SCALE_LADDER, jnp.float32)
        scale = ladder[jax.random.randint(ks[0], (), 0, len(self.SCALE_LADDER))]
        x1 = jax.random.uniform(ks[1], (), jnp.float32, -1.0, 1.0)
        x2 = jax.random.uniform(ks[2], (), jnp.float32, -1.0, 1.0)
        posx = jax.random.uniform(ks[3], (), jnp.float32, 0.0, 1.0)
        posy = jax.random.uniform(ks[4], (), jnp.float32, 0.0, 1.0)
        a = jnp.stack([scale, x1, x2, posx, posy])
        if a.shape[0] != n_attr:
            raise ValueError(
                f"dsprites device sampler covers the default 5-slider "
                f"vocabulary; got n_attr={n_attr} (train_loop probes this "
                f"and falls back to the host sampler automatically)"
            )
        return jnp.ones((batch, n_attr), jnp.float32) * a, a

    def train_alpha_np(self, rng, batch, n_attr=None, attr_list=None):
        attr_list = attr_list or ["scale", "x", "y", "posx", "posy"]
        alpha_vals, sliders = [], []
        if "scale" in attr_list:
            a = self.SCALE_LADDER[rng.choice(len(self.SCALE_LADDER))]
            alpha_vals.append(a)
            sliders.append(np.ones((batch, 1)) * a)
        if "x" in attr_list:
            for _ in range(2):
                a = rng.uniform(-1, 1)
                alpha_vals.append(a)
                sliders.append(np.ones((batch, 1)) * a)
        for name in ("posx", "posy"):
            if name in attr_list:
                a = rng.uniform(0, 1)
                alpha_vals.append(a)
                sliders.append(np.ones((batch, 1)) * a)
        return (
            np.hstack(sliders).astype(np.float32),
            np.hstack([np.atleast_1d(v) for v in alpha_vals]).astype(np.float32),
        )


TASKS = {
    "face": FaceTransform,
    "scene": SceneTransform,
    "xray": XrayTransform,
    "chair": ChairTransform,
    "dsprites": DspritesTransform,
}


def task_kwargs_from_options(opt) -> dict:
    """Transform-specific constructor kwargs from the grouped option
    namespaces (the reference forwards opt.color.channel into graph kwargs,
    utils/util.py:115-116). Accepts argparse Namespaces or yaml dicts."""
    kw: dict = {}
    if getattr(opt, "transform", "") in ("color", "colorlab"):
        grp = getattr(opt, "color", None)
        ch = (grp.get("channel") if isinstance(grp, dict)
              else getattr(grp, "channel", None))
        if ch is not None:
            kw["channel"] = int(ch)
    return kw


def get_task(transform: str, walk_type: str = "linear", nsliders: int = 1, **kw) -> Task:
    if transform in TASKS:
        return TASKS[transform](walk_type=walk_type, nsliders=nsliders)
    from .geometric import GEOMETRIC_TASKS

    if transform in GEOMETRIC_TASKS:
        return GEOMETRIC_TASKS[transform](walk_type=walk_type, nsliders=nsliders, **kw)
    raise KeyError(
        f"unknown transform '{transform}' "
        f"(have {sorted(TASKS) + sorted(GEOMETRIC_TASKS)})"
    )


def lerp(a: np.ndarray, b: np.ndarray, num_interps: int) -> np.ndarray:
    """Linear latent interpolation over an extended range
    (utils/transforms.py:616-621)."""
    alphas = np.linspace(-1.5, 2.5, num_interps)
    if a.shape != b.shape:
        raise ValueError("A and B must have the same shape to interpolate.")
    return np.array([(1 - al) * a + al * b for al in alphas])


def slerp(a: np.ndarray, b: np.ndarray, num_interps: int) -> np.ndarray:
    """Spherical latent interpolation (utils/transforms.py:623-632)."""
    alphas = np.linspace(-1.5, 2.5, num_interps)
    if a.shape != b.shape:
        raise ValueError("A and B must have the same shape to interpolate.")
    dots = np.sum(a * b, axis=-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    omega = np.arccos(np.clip(dots, 0.0, 1.0))[..., None] + 1e-9
    return np.array(
        [
            (np.sin((1 - al) * omega) / np.sin(omega)) * a
            + (np.sin(al * omega) / np.sin(omega)) * b
            for al in alphas
        ]
    )
