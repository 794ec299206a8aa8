"""Spatial partitioning (sp) for high-resolution synthesis.

Data parallelism has nothing to shard at the B=1..2 batch sizes vis/eval
actually use (`vis_w.py` defaults), and tensor parallelism runs out of profit
at the generator's thin top channels (32 @ 1024-res). The remaining axis is
the image itself: shard the activation H dimension over a 'spatial' mesh
axis. This module installs an activation-sharding hint into
``models.stylegan2.synthesize`` (one ``with_sharding_constraint`` per block);
GSPMD then partitions every conv spatially and inserts the 3x3-halo
exchanges (collective-permute over ICI) itself — no manual halo code, the
scaling-book recipe (annotate shardings, let XLA insert collectives).

Additive vs the reference (strictly single-GPU, SURVEY §2.9). The reference
has no counterpart; the closest analogue is its per-GPU batch loop
(`/root/reference/train.py:25-134` runs everything on one device).

Notes:
- Early layers (H < n_spatial * min_rows_per_device) stay unconstrained:
  a 4x4 const split 8 ways is all halo and no compute. GSPMD reshards at
  the first constrained block.
- min_rows_per_device defaults to 8 = the TPU sublane tile; thinner shards
  would pad every per-device block anyway.
- The s2d fast tail (stylegan2_fast) reshapes H into phase blocks; the hint
  is applied on the standard-path activations only, and GSPMD propagates /
  reshards through the tail as it sees fit — correctness is unaffected
  (equivalence-tested on the virtual mesh, tests/test_spatial.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import hooks as _hooks


def make_mesh_spatial(n_spatial: int | None = None, n_data: int = 1,
                      devices=None) -> Mesh:
    """('data', 'spatial') mesh: batches shard over 'data', activation rows
    over 'spatial'. n_spatial=None takes every remaining device. On a real
    slice, lay 'spatial' along the fastest ICI ring — the per-conv halo
    exchange rides it. Raises with a clear message when fewer devices exist
    than n_data * n_spatial (e.g. --sp_devices on a single-chip host)."""
    from . import mesh as meshlib

    if n_spatial is None:
        devs = list(devices if devices is not None else jax.devices())
        n_spatial = len(devs) // n_data
    if n_spatial < 2:
        raise ValueError(
            f"spatial partitioning wants >= 2 devices on the 'spatial' "
            f"axis, got {n_spatial}"
        )
    return meshlib.make_mesh_2d(n_data=n_data, n_model=n_spatial,
                                devices=devices,
                                axis_names=("data", "spatial"))


class spatial_partitioning:
    """Install the H-axis activation-sharding hint for the context's trace.

    Every jit trace of ``stylegan2.synthesize`` entered under this context
    constrains block activations to ``P(batch_axis, axis, None, None)`` once
    H divides the axis and clears min_rows_per_device. Jitted paths key their
    caches on ``models.hooks.spatial_token()`` (Editor._jit does), so programs
    traced under different hints never mix.

    A class, not a @contextmanager generator, so one instance is REUSABLE
    across sequential with-blocks (and nestable — prior state restores from
    a per-instance stack); spatial_editor hands its context to callers who
    may reasonably open it once per batch loop.
    """

    def __init__(self, mesh: Mesh, axis: str = "spatial",
                 min_rows_per_device: int = 8):
        n = int(mesh.shape[axis])
        batch_axis = "data" if "data" in mesh.shape else None

        def hint(x):
            h = int(x.shape[1])
            if h % n == 0 and h >= n * min_rows_per_device:
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(batch_axis, axis, None, None))
                )
            return x

        def boundary(x):
            # spatial sharding ends at the generator's rgb output: consumer
            # towers (R/VGG/D) have late stages whose H collapses below the
            # mesh axis, where the partitioner mis-transposes stride-2 conv
            # VJPs (shards > rows => wrong gradients, forward exact —
            # measured in tests/test_spatial.py). Their compute is small
            # next to G's; dp covers them when B > 1.
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(batch_axis, None, None, None))
            )

        self._hint, self._boundary = hint, boundary
        self._stack = []

    def __enter__(self):
        # JAX's jaxpr-level trace cache keys on (function, avals) — NOT on
        # the module-global hint — so a same-shape trace from before the
        # context would be silently reused WITHOUT the constraint (measured:
        # the stale unhinted program runs replicated). Entering/exiting
        # spatial mode is a setup-time event; dropping the caches buys
        # correctness for every call pattern at the cost of a retrace.
        # Editor._jit additionally salts its cache names with
        # spatial_token() so its own compiled handles never mix. The token
        # only ever increments (never restores) so no two installs alias.
        jax.clear_caches()
        self._stack.append(_hooks.install(self._hint, self._boundary))
        return self

    def __exit__(self, *exc):
        _hooks.restore(self._stack.pop())
        jax.clear_caches()
        return False


def spatial_editor(editor, walk_params, mesh: Mesh,
                   min_rows_per_device: int = 8):
    """Spatial (optionally + data-parallel) INFERENCE setup, the sp analogue
    of ``mesh.replicate_editor``: replicate the frozen towers and walk over
    the mesh and return (editor, walk, context). Callers run every Editor
    program inside the returned context:

        ed, walk, sp = spatial_editor(ed, walk, make_mesh_spatial(8))
        with sp:
            imgs, a0, orig = ed.sweep(walk, z, panels)

    The towers replicate (weights are small next to 1024px activations);
    only the activations shard. Batches stay host-shaped — jit replicates
    them — or shard over 'data' with mesh.shard_batch on a 2-D mesh.
    """
    repl = NamedSharding(mesh, P())
    ed = editor.with_params(jax.device_put(editor.frozen_params(), repl))
    return ed, jax.device_put(walk_params, repl), spatial_partitioning(
        mesh, min_rows_per_device=min_rows_per_device
    )


def setup_inference_mesh(opt, editor, walk_params):
    """Shared CLI device-setup policy (vis_w / eval): --sp_devices builds a
    (data x spatial) mesh and a spatial_partitioning context; otherwise
    --n_devices replicates for plain data parallelism; otherwise single
    device. Returns (editor, walk_params, mesh, ctx) — callers run every
    Editor program inside ``with ctx:`` and shard batches over `mesh` when
    it is not None."""
    import contextlib

    n_dev = getattr(opt, "n_devices", None) or 1
    n_sp = getattr(opt, "sp_devices", None) or 1
    if n_sp > 1:
        mesh = make_mesh_spatial(n_spatial=n_sp, n_data=n_dev)
        ed, wp, ctx = spatial_editor(editor, walk_params, mesh)
        return ed, wp, mesh, ctx
    if n_dev > 1:
        from . import mesh as meshlib

        mesh = meshlib.make_mesh(n_dev)
        ed, wp = meshlib.replicate_editor(editor, walk_params, mesh)
        return ed, wp, mesh, contextlib.nullcontext()
    return editor, walk_params, None, contextlib.nullcontext()
