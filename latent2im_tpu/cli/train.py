"""Training CLI — single-attribute walk training.

Mirrors the reference's train.py surface:

    python -m latent2im_tpu.cli.train --model stylegan_v2_real --transform face \
        --num_samples 20000 --learning_rate 1e-4 --latent w \
        --walk_type linear --loss l2 --attrList Smiling \
        --attrPath ./dataset/attributes_celeba.txt \
        --models_dir ./models_celeba --overwrite_config \
        --g_path <stylegan2.pt> --reg_path <regressor.model>

Differences from the reference loop (train.py:25-134): the whole iteration is
one jitted XLA program; batches shard over every visible chip; checkpoints
carry optimizer state and resume automatically (--resume).
"""

from __future__ import annotations

import logging
import math
import os

import numpy as np

from ..config.options import TrainOptions
from ..engine.build import build_editor_from_options
from ..engine.train import train_loop
from ..io import checkpoint as ckpt
from ..parallel import mesh as meshlib
from ..tasks.transforms import get_task
from ..utils import image as imgmod
from ..utils import logging as logmod

N_EPOCH_SINGLE = 10  # train.py:34


def run(opt, n_epoch_default: int = N_EPOCH_SINGLE, save_loss_artifacts: bool = False):
    if opt.updateGAN and "stylegan" not in opt.model:
        raise SystemExit(
            "--updateGAN is implemented for the stylegan models only "
            "(the reference's PGGAN updateGAN path is dead code)"
        )
    if opt.updateGAN and opt.no_gan_loss:
        raise SystemExit(
            "--updateGAN needs a discriminator; drop --no_gan_loss"
        )
    output_dir = opt.output_dir
    os.makedirs(os.path.join(output_dir, "results"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "logs"), exist_ok=True)
    logmod.configure(os.path.join(output_dir, "log.txt"))

    editor, walk_params, info = build_editor_from_options(opt)
    from ..tasks.transforms import task_kwargs_from_options

    task = get_task(opt.transform, walk_type=opt.walk_type,
                    nsliders=len(info["attr_list"]),
                    **task_kwargs_from_options(opt))
    # Steerability-lineage transforms (zoom/shift/rotate/color...) train the
    # masked-L2 objective against host-warped targets, not the regressor BCE
    # (pggan transform_base.py:344-349, :388-394) — silently BCE-ing a face
    # regressor against color sliders would train garbage.
    geometric = hasattr(task, "get_target_np")
    if geometric and opt.updateGAN:
        raise SystemExit(
            "--updateGAN with a geometric transform is unsupported: the "
            "masked-L2 walk objective has no GAN term (reference legacy "
            "engine trains these without joint GAN updates)"
        )

    start_epoch, opt_state = 0, None
    if getattr(opt, "resume", False):
        from ..engine.train import make_optimizer

        latest = ckpt.find_resume(output_dir)
        if latest:
            like_state = make_optimizer(opt.learning_rate).init(walk_params)
            walk_params, opt_state, meta = ckpt.load_walk(
                latest, walk_params, opt_state_like=like_state
            )
            start_epoch = int((meta or {}).get("epoch", -1)) + 1
            logging.info("resuming from %s at epoch %d", latest, start_epoch)

    n_devices = getattr(opt, "n_devices", None)
    n_sp = getattr(opt, "sp_devices", None) or 1
    if n_sp > 1:
        # (data x spatial) training mesh: the global batch shards over
        # 'data'; synthesis activation rows shard over 'spatial' (the jitted
        # step traces under the spatial_partitioning context below)
        import jax as _jax

        from ..parallel.spatial import make_mesh_spatial, spatial_partitioning

        mesh = make_mesh_spatial(
            n_spatial=n_sp,
            n_data=n_devices or max(1, len(_jax.devices()) // n_sp),
        )
        sp_ctx = spatial_partitioning(mesh)
    else:
        import contextlib

        mesh = meshlib.make_mesh(n_devices)
        sp_ctx = contextlib.nullcontext()
    n_epochs = opt.n_epochs or n_epoch_default
    # the global batch scales with the data axis only (a 2-D mesh's spatial
    # axis multiplies per-sample compute, not samples)
    batch = opt.batch_size * int(mesh.shape["data"])

    writer = _maybe_tensorboard(os.path.join(output_dir, "logs"))
    save_freq = opt.model_save_freq
    loss_values: list[float] = []
    step_counter = {"n": 0}

    def on_step(epoch, i, metrics, dt, current_walk):
        loss = float(metrics["loss"])
        loss_values.append(loss)
        s = step_counter["n"]
        if writer is not None:
            writer.add_scalar("Loss/train", loss, s)
        logging.info(
            "T, epc, bst, lss, alpha: %.3f, %d, %d, %.5f, %.2f",
            dt, epoch, i * batch, loss, float(metrics["alpha_target_mean"]),
        )
        step_counter["n"] += 1
        gan_state["walk"] = current_walk  # --updateGAN edits with the live walk
        if (save_freq and i % save_freq == 0 and not geometric
                and editor.cfg.walk_kind != "embed"):
            # apply_alpha regresses attribute targets — meaningless for
            # pixel-warp objectives (geometric sample grids come from vis_w)
            # and alpha-less for embed walks (apply_alpha raises for them)
            _save_samples(editor, current_walk, output_dir, epoch, i, batch)

    def on_epoch_end(epoch, wp, st):
        ckpt.save_walk(output_dir, epoch, wp, opt_state=st)
        logging.info("Save W in %s", ckpt.walk_ckpt_path(output_dir, epoch))

    frozen_provider = None
    gan_state = {"walk": walk_params}
    if opt.updateGAN:
        # Joint GAN fine-tuning (the reference's --updateGAN raises;
        # engine/gan.py implements the WGAN-GP machinery). D sees real images
        # from --real_data_dir vs the walk-EDITED G outputs; the walk step
        # picks up the refreshed G through the live-frozen channel each
        # iteration.
        assert opt.real_data_dir, "--updateGAN needs --real_data_dir"
        frozen_provider = _make_gan_provider(editor, opt, mesh, gan_state, task)

    # Preemption safety (SURVEY §5.3): TPU pools deliver SIGTERM before
    # reclaiming a VM — checkpoint walk + optimizer state and exit cleanly so
    # --resume continues exactly where the run stopped.
    import signal

    stop_box = {"stop": False}

    def _on_sigterm(signum, frame):
        logging.warning("SIGTERM received: checkpointing and stopping")
        stop_box["stop"] = True

    prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)

    def on_preempt(epoch, wp, st):
        # meta epoch = epoch-1 so --resume RE-RUNS the interrupted epoch
        # (repeating a few steps is benign; skipping half an epoch is not)
        path = ckpt.save_walk(output_dir, epoch, wp, opt_state=st,
                              extra_meta={"epoch": epoch - 1,
                                          "preempted": True})
        if gan_state.get("module") is not None:
            _save_gan(gan_state["module"],
                      os.path.join(output_dir, "model_gan_resume.ckpt"))
            logging.warning("fine-tuned GAN preemption checkpoint written")
        stop_box["preempted"] = True
        logging.warning("preemption checkpoint written: %s", path)

    try:
        with logmod.profile_trace(getattr(opt, "profile_dir", "")), sp_ctx:
            if geometric:
                from ..engine.train import geometric_train_loop

                walk_params, history = geometric_train_loop(
                    editor,
                    task,
                    walk_params,
                    num_samples=opt.num_samples,
                    batch_size=batch,
                    n_epochs=n_epochs,
                    lr=opt.learning_rate,
                    log_every=1,
                    on_step=on_step,
                    on_epoch_end=on_epoch_end,
                    start_epoch=start_epoch,
                    opt_state=opt_state,
                    stop_flag=lambda: stop_box["stop"],
                    on_preempt=on_preempt,
                    mesh=None if getattr(opt, "host_targets", False) else mesh,
                    device_targets=not getattr(opt, "host_targets", False),
                )
            else:
                walk_params, history = train_loop(
                    editor,
                    task,
                    walk_params,
                    num_samples=opt.num_samples,
                    batch_size=batch,
                    n_epochs=n_epochs,
                    lr=opt.learning_rate,
                    mesh=mesh,
                    log_every=1,
                    on_step=on_step,
                    on_epoch_end=on_epoch_end,
                    start_epoch=start_epoch,
                    opt_state=opt_state,
                    frozen_provider=frozen_provider,
                    stop_flag=lambda: stop_box["stop"],
                    on_preempt=on_preempt,
                )
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
    if stop_box.get("preempted"):
        return walk_params, history
    ckpt.save_walk(output_dir, n_epochs, walk_params, final=True)
    if getattr(opt, "export_ref_walk", False):
        # reference-format module pickle alongside the native checkpoint,
        # loadable by the reference's load_multi_models
        # (transform_base.py:497-505)
        import jax

        from ..io.torch_convert import export_walk_torch

        export_walk_torch(
            os.path.join(output_dir, f"model_w_{n_epochs}_final_ref"
                                     "_walk_module.ckpt"),
            editor.cfg.walk_kind,
            jax.device_get(walk_params),
            attr_list=list(info["attr_list"]),
        )
    if gan_state.get("module") is not None:
        # save the fine-tuned GAN (the reference's save_path_gan surface)
        _save_gan(gan_state["module"],
                  os.path.join(output_dir, f"model_gan_{n_epochs}_final.ckpt"))

    if save_loss_artifacts:
        np.save(os.path.join(output_dir, "loss_values.npy"), np.asarray(loss_values))
        _save_loss_curve(loss_values, os.path.join(output_dir, "loss_curve.png"))
    if writer is not None:
        writer.close()
    return walk_params, history


def _save_gan(mod, path):
    from ..io import checkpoint as ckpt

    # optimizer states included so a preempted --updateGAN run resumes
    # bit-exactly (same contract as the walk checkpoints)
    ckpt.save_pytree(
        path, {"g": mod.g_params, "g_running": mod.g_running,
               "d": mod.d_params, "g_opt_state": mod.g_opt_state,
               "d_opt_state": mod.d_opt_state}
    )


def _make_gan_provider(editor, opt, mesh, gan_state, task):
    """Build the per-iteration GAN update callback for --updateGAN.

    Semantics mirror the reference's commented WGAN-GP block (pggan
    transform_base.py:413-471): D scores real images against the walk-EDITED
    fakes (feed_dict['logit'] there is the edited image), and the G step adds
    LAMBDA * masked edit loss when the task defines a pixel-space target
    (get_edit_loss, pggan transform_base.py:344-349). Real batches ride the
    native threaded Loader (native/l2i_native.cpp) so the chip never waits on
    per-image Python decode.
    """
    import glob as globmod

    import jax
    import jax.numpy as jnp

    from ..engine.gan import GANModule, make_gan_update_steps
    from ..models import stylegan2 as sg2
    from ..parallel import mesh as meshlib

    size = editor.cfg.size
    cdt = editor.cfg.compute_dtype
    assert editor.d_params is not None, "--updateGAN needs a discriminator"
    mod = GANModule.create(editor.g_params, d_params=editor.d_params,
                           lr=opt.gan_lr)
    resume_gan = os.path.join(opt.output_dir, "model_gan_resume.ckpt")
    if getattr(opt, "resume", False) and os.path.isfile(resume_gan):
        from ..io import checkpoint as ckptmod

        like = {"g": mod.g_params, "g_running": mod.g_running,
                "d": mod.d_params, "g_opt_state": mod.g_opt_state,
                "d_opt_state": mod.d_opt_state}
        try:
            # structure-full restore: weights AND Adam moments, so a
            # preempted-and-resumed fine-tune is bit-reproducible
            tree = ckptmod.load_pytree(resume_gan, like)
            mod.g_opt_state = tree["g_opt_state"]
            mod.d_opt_state = tree["d_opt_state"]
        except Exception:
            # pre-optimizer-state checkpoint: weights only, moments restart
            tree = ckptmod.load_gan_state(resume_gan)
            logging.warning(
                "old-format GAN checkpoint: optimizer moments reinitialized"
            )
        mod.g_params, mod.g_running = tree["g"], tree["g_running"]
        if tree.get("d") is not None:
            mod.d_params = tree["d"]
        logging.info("restored fine-tuned GAN from %s", resume_gan)
    gan_state["module"] = mod
    n_attr = len(editor.cfg.attr_idx)

    def g_apply(gp, batch):
        # The GAN sees the same edited distribution the walk step produces —
        # and runs the SAME pipeline (latent space, kernel impl,
        # reg_input_size) by routing through the Editor with the live G.
        ed = editor.with_params({"g": gp, "reg": batch["reg"]})
        latent = ed.get_w(batch["z"]) if editor.cfg.latent == "w" else batch["z"]
        orig = ed.synthesize(latent)
        delta = batch["alpha"] - ed.regress(orig)
        latent_new = ed.edit(batch["walk"], latent, delta)
        return ed.synthesize(latent_new)

    def d_apply(dp, img):
        return sg2.discriminator_forward(dp, img, dtype=cdt)

    d_step, g_step = make_gan_update_steps(g_apply, d_apply, mod.g_opt,
                                           mod.d_opt)
    paths = sorted(
        p for p in globmod.glob(os.path.join(opt.real_data_dir, "**", "*"),
                                recursive=True)
        if p.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    assert paths, f"no images under {opt.real_data_dir}"
    next_real = _make_real_batcher(paths, size, opt.batch_size)
    rng = np.random.RandomState(0)
    key_box = [jax.random.PRNGKey(123)]
    has_pixel_target = hasattr(task, "get_target_np")

    def provider(epoch, i):
        real = jnp.asarray(next_real(), jnp.float32) / 127.5 - 1.0
        z = jnp.asarray(rng.randn(opt.batch_size, editor.cfg.dim_z),
                        jnp.float32)
        alpha_graph, alpha_target = task.train_alpha_np(
            rng, opt.batch_size, n_attr
        )
        batch = {"z": z, "alpha": jnp.asarray(alpha_graph),
                 "walk": gan_state["walk"], "reg": editor.reg_params}
        key_box[0], k1 = jax.random.split(key_box[0])
        mod.d_params, mod.d_opt_state, _ = d_step(
            mod.d_params, mod.d_opt_state, mod.g_params, batch, real, k1
        )
        target = mask = None
        if has_pixel_target:
            # geometric lineage: masked L2 toward the warped original
            # (get_target_np takes the RAW alpha, not the graph slider —
            # Zoom's slider is log-scaled)
            ed = editor.with_params({"g": mod.g_params})
            latent = (ed.get_w(batch["z"]) if editor.cfg.latent == "w"
                      else batch["z"])
            orig = np.asarray(ed.synthesize(latent), np.float32)
            target_np, mask_np = task.get_target_np(orig, alpha_target)
            target = jnp.asarray(target_np, jnp.float32)
            mask = jnp.asarray(mask_np, jnp.float32)
        mod.g_params, mod.g_opt_state, mod.g_running, _ = g_step(
            mod.g_params, mod.g_opt_state, mod.g_running, mod.d_params, batch,
            target, mask,
        )
        frozen = dict(editor.frozen_params())
        frozen["g"] = mod.g_params
        frozen["d"] = mod.d_params
        return meshlib.replicate(mesh, frozen) if mesh is not None else frozen

    return provider


def _make_real_batcher(paths, size, batch_size):
    """-> next() yielding [B, size, size, 3] uint8 batches; threaded C++
    prefetch Loader with a per-image PIL fallback. Ragged tail batches are
    carried over in a buffer (never dropped — a dataset smaller than
    batch_size must still make progress, spanning epochs as needed)."""
    try:
        from ..native import _l2i_native as nat

        loader = nat.Loader(paths, size, batch_size, threads=2)
        epoch_box = [0]
        loader.start_epoch(seed=0, shuffle=True)
        buf = []  # leftover rows from ragged batches

        def next_native():
            while True:
                if len(buf) >= batch_size:
                    out = np.stack(buf[:batch_size])
                    del buf[:batch_size]
                    return out
                try:
                    raw, idx = loader.next_batch()
                except StopIteration:
                    epoch_box[0] += 1
                    loader.start_epoch(seed=epoch_box[0], shuffle=True)
                    continue
                b = np.frombuffer(raw, np.uint8).reshape(
                    len(idx), size, size, 3
                )
                if not buf and len(idx) == batch_size:
                    return b
                buf.extend(b)

        return next_native
    except ImportError:
        from ..utils.image import load_and_resize_image

        rng = np.random.RandomState(0)

        def next_py():
            idx = rng.randint(0, len(paths), size=batch_size)
            return np.stack([load_and_resize_image(paths[j], size)
                             for j in idx])

        return next_py


def _save_samples(editor, walk_params, output_dir, epoch, i, batch_size):
    """Periodic org/edited sample grids (train.py:118-122, :137-144)."""
    try:
        z = np.random.RandomState(epoch * 10000 + i).randn(
            min(batch_size, 4), editor.cfg.dim_z
        ).astype(np.float32)
        target = np.full((z.shape[0], len(editor.cfg.attr_list)), 0.9, np.float32)
        edited, _, orig = editor.apply_alpha(walk_params, z, target)
        cols = int(math.sqrt(max(z.shape[0], 1))) or 1
        for name, im in (("org", orig), ("logit", edited)):
            grid = imgmod.imgrid(imgmod.to_uint8(im), cols=cols)
            imgmod.save_im(
                grid,
                os.path.join(output_dir, "results",
                             f"{epoch}_{i * batch_size}_{name}"),
            )
    except Exception:  # sample saving must never kill training
        logging.exception("make_samples failed")


def _save_loss_curve(values, path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure()
        plt.plot(values)
        plt.xlabel("step")
        plt.ylabel("loss")
        plt.savefig(path)
        plt.close()
    except Exception:
        logging.warning("matplotlib unavailable; skipped loss curve png")


def _maybe_tensorboard(log_dir):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(log_dir)
    except Exception:
        logging.warning("tensorboard unavailable; scalar logging to log.txt only")
        return None


def main():
    opt = TrainOptions().parse()
    run(opt)


if __name__ == "__main__":
    main()
