"""The jitted walk-training step and epoch loop.

One ``train_step`` fuses the whole iteration the reference spreads over
train.py:48-116 — two generator forwards, regressor/VGG/D forwards, loss,
backward through the frozen graph into the walk params only, Adam update —
into a single XLA program. Under a multi-chip mesh the batch shards over
'data' and XLA all-reduces walk grads over ICI (see parallel/mesh.py).

Optimizer: Adam(lr, betas=(0.5, 0.99)) exactly as transform_base.py:329-331.
Alpha targets are sampled device-side per step from a folded key (statistics
match the reference's host numpy sampling; a host-parity path exists via
tasks.Task.train_alpha_np).
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel import mesh as meshlib
from ..tasks.transforms import Task
from . import losses as L
from .editor import Editor


def make_optimizer(lr: float) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.5, b2=0.99)


def make_train_step(
    editor: Editor,
    task: Task,
    optimizer: optax.GradientTransformation,
    mesh=None,
    host_alpha: bool = False,
    frozen_shardings=None,
    train_embed: bool = False,
) -> Callable:
    """Returns step(walk_params, opt_state, z_batch, key) ->
    (walk_params, opt_state, metrics).

    host_alpha=True switches alpha-target sampling from the device-side
    folded-key path to an explicit `sampled` argument the host provides
    (e.g. via task.train_alpha_np) — the reference's exact host-numpy
    sampling semantics (train.py:48-58), and the hook the torch
    training-dynamics parity test injects through.

    train_embed=True is the --trainEmbed discrete-embedding mode
    (reference WalkEmbed, transform_base.py:21-41 + the transforms'
    trainEmbed branches): the host samples one discrete panel index per
    step (task.train_alpha_embed_np) and the step trains THAT bank entry —
    step takes an extra int32 `index` argument threaded into the walk as a
    dynamic bank index. Implies host sampling. (The reference's own
    stylegan train path crashes here — get_w_new_tensor calls
    WalkEmbed.forward with a mismatched signature, transform_base.py:
    381-386 — so this implements the semantics its z path defines,
    working, like --updateGAN.)

    frozen_shardings: optional NamedSharding pytree for the frozen towers
    on a 2-D ('data', 'model') mesh — e.g. meshlib.frozen_tp_shardings for
    tensor-parallel G (weights/activations shard over 'model', GSPMD
    inserts the per-block psums). Default: towers replicate."""
    cfg = editor.cfg
    n_attr = len(cfg.attr_list)
    if train_embed:
        host_alpha = True
    # the reference only ever trains WalkEmbed single-attribute; the bank of
    # the first configured attribute is the trained one
    embed_name = cfg.attr_list[0] if train_embed else None
    # Frozen towers travel as jit ARGUMENTS (closures would embed them as HLO
    # constants — hundreds of MB of program payload at full size).
    frozen_host = editor.frozen_params()

    def loss_fn(walk_params, z, key, frozen, host_sampled=None, index=None):
        ed = editor.with_params(frozen)
        k_alpha, k_n1, k_n2 = jax.random.split(key, 3)
        # Fresh noise per forward matches the reference's randomize_noise=True
        # training default (networks.py:476-483): the content loss sees noise
        # variation instead of memorizing fixed buffers. Deterministic per
        # step via the folded key. cfg.fixed_noise restores buffer mode.
        nk1, nk2 = (None, None) if cfg.fixed_noise else (k_n1, k_n2)
        if cfg.latent == "w":
            latent = ed.get_w(z)
        else:
            latent = z
        img_org = ed.synthesize(latent, noise_key=nk1)
        alpha_org = ed.regress(img_org)

        if host_sampled is None:
            sampled, _ = task.train_alpha(k_alpha, z.shape[0], n_attr)
        else:
            sampled = host_sampled
        target, delta = ed.unified_alphas(alpha_org, sampled)

        # The walk input: stylegan feeds the delta (train.py:101 via
        # get_alphas); pggan ALSO feeds the clamped delta (train_multi_attr.py
        # ag = alpha_delta_new after get_alphas) — only a stylegan z run feeds
        # the raw sampled step. Keeping walk input and BCE target consistent
        # matters when the clamp engages (alpha~U(-1,1), org in [0,1]).
        if train_embed:
            # the discrete bank entry at `index` is the trained parameter;
            # alpha is unused by the embed walk (WalkEmbed.forward ignores
            # it, transform_base.py:35-41)
            latent_new = ed.edit(walk_params, latent, sampled,
                                 name=embed_name, index=index)
        elif cfg.latent == "w" or cfg.alpha_mode == "delta":
            latent_new = ed.edit(walk_params, latent, delta)
        else:
            latent_new = ed.edit(walk_params, latent, sampled)
        if cfg.remat_g == "block":
            # per-block checkpoints: same +1 recomputed forward as 'all',
            # but only one block's residuals live at a time in the backward
            img_new = ed.synthesize(latent_new, noise_key=nk2,
                                    block_remat=True)
        elif cfg.remat_g:
            # recompute the edited-path G forward during backward instead of
            # storing its activations (cfg.remat_g docstring)
            img_new = jax.checkpoint(
                lambda lat: ed.synthesize(lat, noise_key=nk2)
            )(latent_new)
        else:
            img_new = ed.synthesize(latent_new, noise_key=nk2)

        # cfg.remat_towers: checkpoint each loss tower so the backward
        # recomputes its full-res activations instead of storing them —
        # peak memory becomes max(one tower) instead of sum(all towers),
        # the enabling config for 1024px batches beyond remat_g's ceiling.
        # Values/grads are exact (tested). Only the EDITED paths matter:
        # img_org has no walk dependence, so the first regress/VGG(org)
        # branches carry no backward anyway.
        def _ckpt(fn):
            return jax.checkpoint(fn) if cfg.remat_towers else fn

        preds = _ckpt(ed.regress)(img_new)
        # stylegan trainers feed the sampled target to the BCE
        # (train.py:101, transform_base.py:416-424); pggan feeds the clamped
        # target (train_multi_attr.py:133) — unified_alphas encodes both.
        reg = L.reg_loss(preds, target, stable=cfg.stable_bce)

        if cfg.no_content_loss:
            content = 0.0
        else:
            content = _ckpt(
                lambda org, new: L.content_loss(ed.vgg_params, org, new,
                                                dtype=cfg.compute_dtype)
            )(ed._content_input(img_org), ed._content_input(img_new))
        if cfg.no_gan_loss:
            gan = 0.0
        else:
            gan = _ckpt(
                lambda new: L.gan_loss_from_logits(ed.discriminate(new))
            )(img_new)

        total = L.combine(
            reg,
            content,
            gan,
            no_content_loss=cfg.no_content_loss,
            no_gan_loss=cfg.no_gan_loss,
            pggan_gating=(cfg.model == "pggan"),
        )
        metrics = {
            "loss": total,
            "reg_loss": reg,
            "content_loss": jnp.asarray(content),
            "gan_loss": jnp.asarray(gan),
            "alpha_target_mean": jnp.mean(target),
        }
        return total, metrics

    if train_embed:
        def step_fn(walk_params, opt_state, z, key, sampled, index, frozen):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                walk_params, z, key, frozen, sampled, index
            )
            updates, opt_state = optimizer.update(grads, opt_state, walk_params)
            walk_params = optax.apply_updates(walk_params, updates)
            return walk_params, opt_state, metrics
    elif host_alpha:
        def step_fn(walk_params, opt_state, z, key, sampled, frozen):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                walk_params, z, key, frozen, sampled
            )
            updates, opt_state = optimizer.update(grads, opt_state, walk_params)
            walk_params = optax.apply_updates(walk_params, updates)
            return walk_params, opt_state, metrics
    else:
        def step_fn(walk_params, opt_state, z, key, frozen):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                walk_params, z, key, frozen
            )
            updates, opt_state = optimizer.update(grads, opt_state, walk_params)
            walk_params = optax.apply_updates(walk_params, updates)
            return walk_params, opt_state, metrics

    if mesh is not None:
        repl = meshlib.replicated(mesh)
        data = meshlib.batch_sharding(mesh)
        fr_sh = repl if frozen_shardings is None else frozen_shardings
        if train_embed:
            in_sh = (repl, repl, data, repl, data, repl, fr_sh)
        elif host_alpha:
            in_sh = (repl, repl, data, repl, data, fr_sh)
        else:
            in_sh = (repl, repl, data, repl, fr_sh)
        jit_step = jax.jit(
            step_fn,
            in_shardings=in_sh,
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
        frozen_dev = (meshlib.replicate(mesh, frozen_host)
                      if frozen_shardings is None
                      else jax.device_put(frozen_host, frozen_shardings))
    else:
        jit_step = jax.jit(step_fn, donate_argnums=(0, 1))
        frozen_dev = jax.device_put(frozen_host)

    def step(walk_params, opt_state, z, key, frozen=None, sampled=None,
             index=None):
        """frozen: optional live override of the frozen towers (e.g. a
        jointly fine-tuned G under --updateGAN); defaults to the build-time
        params. sampled: the host-sampled alpha batch (host_alpha mode).
        index: the sampled discrete bank index (train_embed mode)."""
        fr = frozen_dev if frozen is None else frozen
        if train_embed:
            if sampled is None or index is None:
                raise ValueError(
                    "train_embed step requires sampled batch and bank index"
                )
            return jit_step(walk_params, opt_state, z, key, sampled,
                            jnp.asarray(index, jnp.int32), fr)
        if host_alpha:
            if sampled is None:
                raise ValueError("host_alpha step requires the sampled batch")
            return jit_step(walk_params, opt_state, z, key, sampled, fr)
        return jit_step(walk_params, opt_state, z, key, fr)

    # exposed for AOT introspection (bench.py FLOP accounting via
    # jit_fn.lower(...).compile().cost_analysis())
    step.jit_fn = jit_step
    step.frozen_dev = frozen_dev
    return step


def make_geometric_train_step(
    editor: Editor,
    optimizer: optax.GradientTransformation,
    train_embed: bool = False,
) -> Callable:
    """Training step for the steerability-lineage geometric/color transforms:
    masked pixel-L2 between the edited image and a host-computed warped
    target (the reference's legacy engine objective, get_edit_loss at
    transform_base.py:388-394; targets from tasks.geometric.get_target_np).

    step(walk_params, opt_state, z, alpha_graph, target, mask) ->
    (walk_params, opt_state, metrics). The host driver synthesizes the
    original, warps it with the task's get_target_np, and feeds both here.
    The frozen G travels as a jit ARGUMENT (closures embed it as HLO
    constants — the documented compile-tunnel 413 failure mode at full size).
    """
    cfg = editor.cfg
    frozen_dev = jax.device_put(editor.frozen_params())
    embed_name = cfg.attr_list[0] if train_embed else None

    def loss_fn(walk_params, z, alpha_graph, target, mask, frozen, index=None):
        ed = editor.with_params(frozen)
        latent = ed.get_w(z) if cfg.latent == "w" else z
        if train_embed:
            latent_new = ed.edit(walk_params, latent, alpha_graph,
                                 name=embed_name, index=index)
        else:
            latent_new = ed.edit(walk_params, latent, alpha_graph)
        img_new = ed.synthesize(latent_new)
        loss = L.masked_l2(img_new, target, mask)
        return loss, {"loss": loss,
                      "alpha_target_mean": jnp.mean(alpha_graph)}

    def step6(walk_params, opt_state, z, alpha_graph, target, mask, frozen,
              index=None):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            walk_params, z, alpha_graph, target, mask, frozen, index
        )
        updates, opt_state = optimizer.update(grads, opt_state, walk_params)
        walk_params = optax.apply_updates(walk_params, updates)
        return walk_params, opt_state, metrics

    jit_step = jax.jit(step6, donate_argnums=(0, 1))

    def step(walk_params, opt_state, z, alpha_graph, target, mask, index=None):
        if train_embed:
            return jit_step(walk_params, opt_state, z, alpha_graph, target,
                            mask, frozen_dev, jnp.asarray(index, jnp.int32))
        return jit_step(walk_params, opt_state, z, alpha_graph, target, mask,
                        frozen_dev)

    return step


def make_geometric_device_step(
    editor: Editor,
    optimizer: optax.GradientTransformation,
    train_embed: bool = False,
    mesh=None,
) -> Callable:
    """Fully-jitted geometric step with IN-GRAPH targets (tasks/warp.py).

    The host-warp loop (make_geometric_train_step) reproduces the
    reference's cv2 round-trip: synthesize on device, pull the batch to the
    host, warp, push target+mask back. Here the warp/color target is part of
    the SAME XLA program as synthesis, loss and the Adam update — zero
    host<->device image traffic — and the batch shards over a mesh like the
    main walk step. The host only supplies the task's device_spec payload: a
    3x3 dst->src matrix (kind 'warp', clamp static) or the per-sample color
    alphas (kinds 'color'/'colorlab').

    step(walk_params, opt_state, z, alpha_graph, spec, index=None) with
    spec = (kind, payload, clamp) from task.device_spec.
    """
    from ..tasks import warp as warplib

    cfg = editor.cfg
    embed_name = cfg.attr_list[0] if train_embed else None
    frozen_host = editor.frozen_params()

    def make_loss(kind, clamp):
        def loss_fn(walk_params, z, alpha_graph, payload, frozen, index=None):
            ed = editor.with_params(frozen)
            latent = ed.get_w(z) if cfg.latent == "w" else z
            img_org = ed.synthesize(latent)
            if kind == "warp":
                target, mask = warplib.warp_target_and_mask(
                    img_org, payload["minv"], clamp=clamp, box=payload["box"]
                )
            elif kind == "color":
                target, mask = warplib.color_target(img_org, payload)
            else:  # colorlab
                target, mask = warplib.colorlab_target(img_org, payload)
            if train_embed:
                latent_new = ed.edit(walk_params, latent, alpha_graph,
                                     name=embed_name, index=index)
            else:
                latent_new = ed.edit(walk_params, latent, alpha_graph)
            img_new = ed.synthesize(latent_new)
            loss = L.masked_l2(img_new, target, mask)
            return loss, {"loss": loss,
                          "alpha_target_mean": jnp.mean(alpha_graph)}
        return loss_fn

    jit_cache: dict[tuple, Callable] = {}

    def get_jit(kind, clamp):
        key = (kind, clamp)
        if key not in jit_cache:
            loss_fn = make_loss(kind, clamp)

            def step_fn(walk_params, opt_state, z, alpha_graph, payload,
                        frozen, index):
                (_, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(walk_params, z, alpha_graph, payload, frozen, index)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      walk_params)
                walk_params = optax.apply_updates(walk_params, updates)
                return walk_params, opt_state, metrics

            if mesh is not None:
                repl = meshlib.replicated(mesh)
                data = meshlib.batch_sharding(mesh)
                # color payloads are per-sample [B, 3] and shard with the
                # batch; warp matrices are shared per step and replicate
                pay_sh = data if kind in ("color", "colorlab") else repl
                jit_cache[key] = jax.jit(
                    step_fn,
                    in_shardings=(repl, repl, data, data, pay_sh, repl, repl),
                    out_shardings=(repl, repl, repl),
                    donate_argnums=(0, 1),
                )
            else:
                jit_cache[key] = jax.jit(step_fn, donate_argnums=(0, 1))
        return jit_cache[key]

    if mesh is not None:
        frozen_dev = meshlib.replicate(mesh, frozen_host)
    else:
        frozen_dev = jax.device_put(frozen_host)

    def step(walk_params, opt_state, z, alpha_graph, spec, index=None):
        kind, payload, clamp = spec
        idx = jnp.asarray(0 if index is None else index, jnp.int32)
        payload = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), payload
        )
        if mesh is not None and kind in ("color", "colorlab"):
            payload = meshlib.shard_batch(mesh, payload)
        return get_jit(kind, bool(clamp))(
            walk_params, opt_state, z, alpha_graph, payload, frozen_dev, idx
        )

    return step


def geometric_train_loop(
    editor: Editor,
    task: Task,
    walk_params,
    *,
    num_samples: int,
    batch_size: int,
    n_epochs: int,
    lr: float,
    seed: int = 0,
    log_every: int = 10,
    on_step: Callable | None = None,
    on_epoch_end: Callable | None = None,
    start_epoch: int = 0,
    opt_state=None,
    stop_flag: Callable | None = None,
    on_preempt: Callable | None = None,
    mesh=None,
    device_targets: bool = True,
) -> tuple[Any, list[float]]:
    """Epoch loop for the steerability-lineage geometric/color transforms —
    the reference's legacy masked-L2 objective (pggan transform_base.py:
    344-349 host warp + :388-394 loss).

    device_targets=True (default, when the task provides device_spec):
    the warp/color target is computed IN the jitted step (tasks/warp.py) —
    zero host warps, one XLA program, mesh-shardable like the main walk step.
    device_targets=False reproduces the reference's host path: synthesize on
    device, pull to host, cv2-warp via task.get_target_np, push back (kept
    for parity testing and tasks without a device form).

    Same callback/resume surface as train_loop. The alpha/RandomState
    streams reseed per epoch so --resume restarts an epoch reproducibly."""
    optimizer = make_optimizer(lr)
    if opt_state is None:
        opt_state = optimizer.init(walk_params)
    train_embed = editor.cfg.walk_kind == "embed"
    use_device = device_targets and hasattr(task, "device_spec")
    if use_device:
        step = make_geometric_device_step(editor, optimizer,
                                          train_embed=train_embed, mesh=mesh)
    else:
        if mesh is not None:
            raise ValueError(
                "the host-warp geometric path is per-host; mesh requires "
                "device_targets=True"
            )
        step = make_geometric_train_step(editor, optimizer,
                                         train_embed=train_embed)

    cfg = editor.cfg
    if mesh is not None:
        walk_params = meshlib.replicate(mesh, walk_params)
        opt_state = meshlib.replicate(mesh, opt_state)
    if not use_device:
        # only the host-warp branch synthesizes outside the step; the device
        # step holds its own tower copy, and a second one here would burn
        # HBM headroom the 1024px configs need
        frozen_dev = jax.device_put(editor.frozen_params())

        def _orig(frozen, z):
            ed = editor.with_params(frozen)
            latent = ed.get_w(z) if cfg.latent == "w" else z
            return ed.synthesize(latent)

        orig_fn = jax.jit(_orig)

    history: list[float] = []
    for epoch in range(start_epoch, n_epochs):
        zs = sample_epoch_z(num_samples, cfg.dim_z, seed=epoch)
        rng = np.random.RandomState(_alpha_seed(seed, epoch))
        iters = num_samples // batch_size
        for i in range(iters):
            if stop_flag is not None and stop_flag():
                if on_preempt is not None:
                    on_preempt(epoch, walk_params, opt_state)
                return walk_params, history
            t0 = time.time()
            z = jnp.asarray(zs[i * batch_size : (i + 1) * batch_size])
            index = None
            if train_embed:
                alpha_graph, alpha_target, index = task.train_alpha_embed_np(
                    rng, batch_size
                )
            else:
                alpha_graph, alpha_target = task.train_alpha_np(rng, batch_size)
            if use_device:
                if mesh is not None:
                    z = meshlib.shard_batch(mesh, z)
                walk_params, opt_state, metrics = step(
                    walk_params, opt_state, z,
                    jnp.asarray(alpha_graph, np.float32),
                    task.device_spec(alpha_target, cfg.size),
                    index=index,
                )
            else:
                img_org = np.asarray(orig_fn(frozen_dev, z), np.float32)
                target, mask = task.get_target_np(img_org, alpha_target)
                walk_params, opt_state, metrics = step(
                    walk_params, opt_state, z,
                    jnp.asarray(alpha_graph, np.float32),
                    jnp.asarray(target, np.float32),
                    jnp.asarray(mask, np.float32),
                    index=index,
                )
            if on_step is not None or (log_every and i % log_every == 0):
                metrics = jax.device_get(metrics)
                history.append(float(metrics["loss"]))
                if on_step is not None:
                    on_step(epoch, i, metrics, time.time() - t0, walk_params)
        if on_epoch_end is not None:
            on_epoch_end(epoch, walk_params, opt_state)
    return walk_params, history


def _alpha_seed(seed: int, epoch: int) -> int:
    """Seed for the host alpha-sampling stream, decoupled from
    sample_epoch_z's RandomState(epoch): with the default seed=0 a plain
    seed*100003+epoch collapses to `epoch`, making the alpha stream consume
    the same Mersenne-Twister words as the epoch's z batch. The large
    per-epoch stride keeps the two streams' seeds disjoint for any epoch
    count a training run reaches."""
    return (seed * 100003 + 70001 * epoch + 35117) % (2**31)


def sample_epoch_z(num_samples: int, dim_z: int, seed: int) -> np.ndarray:
    """Host z sampling, bit-matching the reference
    (graph_util.py:5-8, re-seeded per epoch at train.py:45)."""
    return np.random.RandomState(seed).randn(num_samples, dim_z).astype(np.float32)


def train_loop(
    editor: Editor,
    task: Task,
    walk_params,
    *,
    num_samples: int,
    batch_size: int,
    n_epochs: int,
    lr: float,
    mesh=None,
    seed: int = 0,
    log_every: int = 10,
    on_step: Callable | None = None,
    on_epoch_end: Callable | None = None,
    start_epoch: int = 0,
    opt_state=None,
    frozen_provider: Callable | None = None,
    stop_flag: Callable | None = None,
    on_preempt: Callable | None = None,
) -> tuple[Any, list[float]]:
    """The reference's epoch/iteration structure (train.py:39-132) around the
    jitted step. Returns (walk_params, loss_history). Pass start_epoch +
    opt_state (from io.checkpoint.load_walk) to resume a preempted run.

    stop_flag() -> bool is polled between iterations (e.g. set by a SIGTERM
    handler on preemptible TPU pools); when it trips, on_preempt(epoch,
    walk_params, opt_state) runs (checkpoint!) and the loop returns early.
    """
    optimizer = make_optimizer(lr)
    if opt_state is None:
        opt_state = optimizer.init(walk_params)
    # Probe the device-side alpha sampler once (eager): tasks whose device
    # sampler can't express the configured vocabulary (e.g. dsprites
    # --attrList subsets) fall back to host-numpy sampling via the
    # host_alpha step — same statistics, reference-style host stream.
    n_attr = len(editor.cfg.attr_list)
    # --trainEmbed runs sample a discrete panel index per step on the host
    # (reference get_train_alpha trainEmbed branches) and train that bank
    # entry; detected from the walk kind the build resolved.
    train_embed = editor.cfg.walk_kind == "embed"
    host_alpha = False
    if not train_embed:
        try:
            task.train_alpha(jax.random.PRNGKey(0), 1, n_attr)
        except ValueError as e:
            # the documented vocab-mismatch signal (e.g. dsprites --attrList
            # subsets); anything else is a genuine sampler bug and should raise
            host_alpha = True
            print(f"note: device alpha sampler declined ({e}); "
                  "falling back to host-numpy sampling")
    step = make_train_step(editor, task, optimizer, mesh=mesh,
                           host_alpha=host_alpha, train_embed=train_embed)
    if mesh is not None:
        walk_params = meshlib.replicate(mesh, walk_params)
        opt_state = meshlib.replicate(mesh, opt_state)

    key = jax.random.PRNGKey(seed)
    history: list[float] = []
    it_global = start_epoch * (num_samples // batch_size)
    for epoch in range(start_epoch, n_epochs):
        zs = sample_epoch_z(num_samples, editor.cfg.dim_z, seed=epoch)
        alpha_rng = np.random.RandomState(_alpha_seed(seed, epoch))
        iters = num_samples // batch_size
        for i in range(iters):
            if stop_flag is not None and stop_flag():
                if on_preempt is not None:
                    on_preempt(epoch, walk_params, opt_state)
                return walk_params, history
            t0 = time.time()
            z = zs[i * batch_size : (i + 1) * batch_size]
            if mesh is not None:
                z = meshlib.shard_batch(mesh, z)
            step_key = jax.random.fold_in(key, it_global)
            frozen = frozen_provider(epoch, i) if frozen_provider else None
            sampled, index = None, None
            if train_embed:
                sampled, _, index = task.train_alpha_embed_np(
                    alpha_rng, batch_size, n_attr
                )
                sampled = np.asarray(sampled, np.float32)
                if mesh is not None:
                    sampled = meshlib.shard_batch(mesh, sampled)
            elif host_alpha:
                try:
                    sampled, _ = task.train_alpha_np(
                        alpha_rng, batch_size, n_attr,
                        attr_list=list(editor.cfg.attr_list),
                    )
                except TypeError:  # samplers without an attr_list kwarg
                    sampled, _ = task.train_alpha_np(alpha_rng, batch_size,
                                                     n_attr)
                sampled = np.asarray(sampled, np.float32)
                if mesh is not None:
                    sampled = meshlib.shard_batch(mesh, sampled)
            walk_params, opt_state, metrics = step(
                walk_params, opt_state, z, step_key, frozen=frozen,
                sampled=sampled, index=index,
            )
            if on_step is not None or (log_every and i % log_every == 0):
                metrics = jax.device_get(metrics)
                history.append(float(metrics["loss"]))
                if on_step is not None:
                    # NOTE: the step donates its input buffers — callbacks must
                    # use these CURRENT params, never a stale pre-step tree.
                    on_step(epoch, i, metrics, time.time() - t0, walk_params)
            it_global += 1
        if on_epoch_end is not None:
            # opt_state included so per-epoch checkpoints resume EXACTLY
            # (dropping it silently reinitializes Adam moments on --resume)
            on_epoch_end(epoch, walk_params, opt_state)
    return walk_params, history
