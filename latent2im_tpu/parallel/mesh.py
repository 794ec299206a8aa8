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


def make_mesh_2d(n_data: int | None = None, n_model: int = 1,
                 devices=None,
                 axis_names: tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D ('data', 'model') mesh for combined data + tensor parallelism.

    The 'data' axis shards batches (as in make_mesh); the 'model' axis
    shards the big frozen-tower weights/activations (stylegan2_tp_specs).
    On a real slice, lay 'model' along the fastest ICI ring — the per-block
    psum rides it every step. axis_names lets other parallelism styles
    reuse the same device-selection logic (spatial.make_mesh_spatial names
    the second axis 'spatial')."""
    devs = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devs) // n_model
    need = n_data * n_model
    if n_data < 1 or need > len(devs):
        raise ValueError(
            f"({axis_names[0]} x {axis_names[1]}) mesh wants "
            f"{n_data}x{n_model} = {need} devices, have {len(devs)}"
        )
    devs = devs[:need]
    return Mesh(np.array(devs).reshape(n_data, n_model), axis_names)


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
    # the batch shards over the 'data' axis only (replicated over 'model'
    # on a 2-D mesh), so that's the divisibility requirement
    n_dev = int(mesh.shape.get("data", np.prod(mesh.devices.shape)))
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


def _repl_like(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def stylegan2_tp_specs(g_params) -> dict:
    """Tensor-parallel PartitionSpecs for a models.stylegan2 generator tree.

    Megatron-style column/row alternation per resolution block: the up-conv
    shards OUTPUT channels over 'model' (its noise/bias epilogue stays
    channel-sharded), the partner 3x3 conv shards INPUT channels — so each
    block pays exactly one XLA-inserted psum over the 'model' axis, and the
    inter-conv activations never materialize unsharded. Style MLP, const,
    to_rgbs, and noise buffers replicate (small). GSPMD propagates the
    activation shardings and inserts the collectives; nothing in the model
    code changes.
    """
    specs = {
        "style": _repl_like(g_params["style"]),
        "const": P(),
        "conv1": _repl_like(g_params["conv1"]),
        "to_rgb1": _repl_like(g_params["to_rgb1"]),
        "to_rgbs": _repl_like(g_params["to_rgbs"]),
        "noises": _repl_like(g_params["noises"]),
        "convs": [],
    }
    for i, conv in enumerate(g_params["convs"]):
        spec = _repl_like(conv)
        if i % 2 == 0:  # up-conv: column-parallel (shard Cout)
            spec["conv"]["w"] = P(None, None, None, "model")
            spec["act_b"] = P("model")
        else:  # partner conv: row-parallel (shard Cin) -> one psum
            spec["conv"]["w"] = P(None, None, "model", None)
        specs["convs"].append(spec)
    return specs


def frozen_tp_shardings(mesh: Mesh, frozen: dict):
    """NamedShardings for an Editor.frozen_params() tree on a 2-D mesh:
    the StyleGAN2 generator tensor-shards over 'model'
    (stylegan2_tp_specs); the other towers replicate."""
    specs = {k: _repl_like(v) for k, v in frozen.items()}
    if "g" in frozen and isinstance(frozen["g"], dict) \
            and "convs" in frozen["g"]:
        specs["g"] = stylegan2_tp_specs(frozen["g"])
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


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
        except Exception as e:  # noqa: BLE001 — single-host fallback is the
            # normal path, but a MISCONFIGURED pod lands here too: say so
            # once instead of silently degrading to single-host.
            import logging

            logging.getLogger(__name__).info(
                "jax.distributed auto-init unavailable (%s: %s); "
                "proceeding single-host", type(e).__name__, e
            )
    return jax.process_index()


def replicate_editor(editor, walk_params, mesh):
    """Data-parallel INFERENCE setup: replicate the frozen towers and walk
    over the mesh (returns a new editor + walk). Callers then shard the z /
    latent batches with shard_batch(pad=True) — jit propagates the argument
    shardings, so every Editor program (sweep/apply_alpha/regress) runs SPMD
    with no per-path annotations. Additive vs the reference (single-GPU,
    SURVEY §2.9)."""
    if mesh is None:
        return editor, walk_params
    ed = editor.with_params(replicate(mesh, editor.frozen_params()))
    return ed, replicate(mesh, walk_params)
