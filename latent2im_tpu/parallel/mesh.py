"""Device mesh + sharding for multi-chip walk training.

The reference is strictly single-GPU (SURVEY §2.9); this layer is the
TPU-native addition: data parallelism over a 1-D ``Mesh(('data',))`` via jit
with NamedShardings — batches shard over chips, params replicate, and XLA
inserts the gradient ``psum`` over ICI automatically. Multi-host runs reuse
the same program after ``jax.distributed.initialize()``; collectives span
DCN transparently.

No pmap: jit + shardings is the modern single-program path and composes with
pjit-style 2D meshes later (e.g. ('data', 'model') if a future backend needs
tensor parallelism).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over chips."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, pad: bool = False):
    """Place a host array as a sharded device array (per-chip slices travel
    independently; no full-batch copy on any one chip).

    The leading axis must divide the mesh; pad=True rounds it up to
    ``pad_to_devices`` by repeating the last row (for inference sweeps over a
    ragged final batch — callers slice the result back to the true length).
    Training batches must divide exactly: padded rows would bias gradients.
    """
    n_dev = int(np.prod(mesh.devices.shape))
    n = batch.shape[0]
    if n % n_dev:
        if not pad:
            raise ValueError(
                f"batch of {n} does not divide the {n_dev}-device mesh; "
                "pass pad=True (inference) or size batches as a multiple "
                "(training)"
            )
        m = pad_to_devices(n, n_dev)
        batch = np.concatenate(
            [np.asarray(batch), np.repeat(np.asarray(batch[-1:]), m - n, axis=0)]
        )
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_devices(n: int, n_dev: int) -> int:
    """Round a global batch up so it divides the mesh."""
    return ((n + n_dev - 1) // n_dev) * n_dev


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host setup: call once per host before building the mesh; the
    same jit program then spans all hosts, with XLA collectives riding ICI
    within a slice and DCN across slices. No-ops on single-host.

    Returns the process index.
    """
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator is None:
        try:  # TPU pod auto-detection (env-driven); harmless elsewhere
            jax.distributed.initialize()
        except Exception:
            pass
    return jax.process_index()
