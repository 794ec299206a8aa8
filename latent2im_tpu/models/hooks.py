"""Shared activation-sharding hooks for every generator family.

parallel/spatial.py installs a spatial-partitioning hint here; the four
generator forwards (stylegan2, stylegan1, pggan, pgan_zoo) call
``spatial_constrain`` on their block activations and ``spatial_boundary``
on their rgb outputs. Neutral home so no model module depends on another
model's privates, and the install site has one place to mutate.

None => single-device behavior; both hooks are identity (zero overhead).
"""

from __future__ import annotations

_HINT = None
_BOUNDARY = None
_TOKEN = 0  # bumped on every install/uninstall; jit caches key on it


def spatial_token() -> int:
    """Cache-key component for jitted paths that trace through a generator
    forward: a program traced under one hint must not be reused under
    another (the token only ever increments, so no two installs alias)."""
    return _TOKEN


def spatial_constrain(x):
    """Apply the installed per-block activation constraint (identity when
    no spatial partitioning is active)."""
    return _HINT(x) if _HINT is not None else x


def spatial_boundary(x):
    """Apply the installed generator-output constraint (identity when no
    spatial partitioning is active). Spatial sharding must END at the rgb
    output: consumer towers' late stages collapse H below the mesh axis,
    where stride-2 conv VJPs mis-transpose (wrong gradients, forward exact
    — measured; tests/test_spatial.py)."""
    return _BOUNDARY(x) if _BOUNDARY is not None else x


def install(hint, boundary) -> tuple:
    """Install (hint, boundary); returns the previous pair for restore."""
    global _HINT, _BOUNDARY, _TOKEN
    prev = (_HINT, _BOUNDARY)
    _HINT, _BOUNDARY = hint, boundary
    _TOKEN += 1
    return prev


def restore(prev: tuple) -> None:
    global _HINT, _BOUNDARY, _TOKEN
    _HINT, _BOUNDARY = prev
    _TOKEN += 1
