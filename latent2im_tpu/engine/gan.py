"""GAN module containers + EMA — the reference's stylegan2.py/pggan_256.py
wrapper layer.

The reference holds netG/netD plus Adam optimizers and an EMA shadow
(``g_running``, decay 0.999) in small wrapper classes
(graphs/stylegan_v2_real/stylegan2.py:19-64, graphs/pggan/pggan_256.py:11-51);
joint GAN training itself is unimplemented there (train.py:40-41 raises).
This provides the same container + the functional EMA accumulate so
checkpoints with both live/EMA weights round-trip and future joint training
has its scaffolding.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
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
