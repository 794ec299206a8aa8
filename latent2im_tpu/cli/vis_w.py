"""Inference / latent-sweep visualization CLI.

Mirrors vis_w.py: load the training run's opt.yml + a walk checkpoint,
generate per-sample alpha-sweep panels (num_panels linspace min->max alpha),
write PNG grids named with the original attribute score, and an index.html
gallery. The panel loop runs as ONE device program per batch
(Editor.sweep), not a host loop per alpha.

    python -m latent2im_tpu.cli.vis_w <run_dir>/opt.yml \
        --save_path_w <run_dir>/model_w_9_walk_module.ckpt \
        --output_dir ./vis_out [--noise_seed 0]
"""

from __future__ import annotations

import os

import numpy as np

from ..config.options import VisOptions
from ..engine.build import load_editor_for_inference
from ..engine.train import sample_epoch_z
from ..utils import html as htmlmod
from ..utils import image as imgmod

BATCH = 8  # sweep folds P panels into the batch; 8 z x 6 panels fills 2x24-wide programs


def run(opt, conf):
    output_dir = opt.output_dir or os.path.join(
        getattr(conf, "output_dir", "."), "vis"
    )
    os.makedirs(output_dir, exist_ok=True)

    editor, walk_params, info = load_editor_for_inference(opt, conf)

    from ..tasks.transforms import get_task

    from ..tasks.transforms import task_kwargs_from_options

    task = get_task(conf.transform, walk_type=conf.walk_type,
                    nsliders=len(info["attr_list"]),
                    **task_kwargs_from_options(conf))
    alphas = np.linspace(opt.min_alpha, opt.max_alpha, opt.num_panels)

    # Real-image editing: --latents_dir consumes the W+ latents BP.py-style
    # inversion writes ({i}_w.npy) and sweeps those instead of sampled z
    # (the invert -> edit flow the reference leaves to manual glue,
    # transform_base.py:561-564 given_w).
    latents = None
    latents_dir = getattr(opt, "latents_dir", "")
    if latents_dir:
        import glob as globmod

        def _batch_start(path):
            # bp.py names files by numeric batch start (0_w, 4_w, 12_w...);
            # lexicographic order would interleave digit widths
            stem = os.path.basename(path).split("_")[0]
            return (0, int(stem)) if stem.isdigit() else (1, path)

        files = sorted(globmod.glob(os.path.join(latents_dir, "*_w.npy")),
                       key=_batch_start)
        assert files, f"no *_w.npy under {latents_dir}"
        latents = np.concatenate([np.load(f) for f in files]).astype(np.float32)
        opt.num_samples = len(latents)
        print(f"editing {len(latents)} inverted latents from {latents_dir}")
    zs = sample_epoch_z(opt.num_samples, editor.cfg.dim_z, seed=opt.noise_seed)

    # optional multi-device sharding of the sweeps (additive vs the
    # single-GPU reference; identical panels, equivalence-tested):
    # --n_devices shards batches data-parallel; --sp_devices spatially
    # partitions activation rows (the route when the batch is too small to
    # shard — vis runs at B=1..8); together they form a (data x spatial) mesh.
    from ..parallel.spatial import setup_inference_mesh

    editor, walk_params, mesh, sp_ctx = setup_inference_mesh(
        opt, editor, walk_params
    )
    with sp_ctx:
        return _run_sweeps(opt, editor, walk_params, task, alphas, latents,
                           zs, mesh, output_dir)


def _run_sweeps(opt, editor, walk_params, task, alphas, latents, zs, mesh,
                output_dir):
    from ..parallel import mesh as meshlib  # noqa: F401 — used when mesh set

    combine = getattr(opt, "combine_indices", "")
    if combine:
        # 2-attribute grid (transform_base.py:814-869): all (a_i, a_j) pairs
        idx = [int(i) for i in combine.split(",")]
        assert len(idx) == 2, "--combine_indices wants two attribute indices"
        for batch_start in range(0, opt.num_samples, BATCH):
            z = zs[batch_start : batch_start + BATCH]
            nb = z.shape[0]
            gw = None
            if latents is not None:
                import jax.numpy as jnp

                gw = jnp.asarray(latents[batch_start : batch_start + BATCH])
                if mesh is not None:
                    gw = meshlib.shard_batch(mesh, np.asarray(gw), pad=True)
            if mesh is not None:
                z = meshlib.shard_batch(mesh, z, pad=True)
            imgs, alpha_org, _ = editor.sweep_combine(
                walk_params, z, alphas, indices=idx, given_w=gw, u8=True
            )
            if z.shape[0] != nb:
                imgs = imgs[:, :, :nb]
            grid = imgmod.to_uint8(imgs)  # [P, P, B, H, W, 3]
            p = len(alphas)
            for ii in range(nb):
                panel = grid[:, :, ii].reshape(p * p, *grid.shape[3:])
                name = f"combine_idx{idx[0]}_idx{idx[1]}_sample{batch_start + ii}"
                imgmod.save_im(
                    imgmod.imgrid(panel, cols=p), os.path.join(output_dir, name)
                )
                print("Save in", os.path.join(output_dir, name))
        htmlmod.make_html(output_dir)
        return output_dir

    for batch_start in range(0, opt.num_samples, BATCH):
        z = zs[batch_start : batch_start + BATCH]
        nb = z.shape[0]
        gw = None
        if latents is not None:
            import jax.numpy as jnp

            gw = jnp.asarray(latents[batch_start : batch_start + BATCH])
            if mesh is not None:
                gw = meshlib.shard_batch(mesh, np.asarray(gw), pad=True)
        if mesh is not None:
            z = meshlib.shard_batch(mesh, z, pad=True)
        # panel slider matrix [P, B, A] (scale_test_alpha_for_graph semantics)
        panels = np.stack(
            [task.scale_test_alpha(a, z.shape[0]) for a in alphas]
        ).astype(np.float32)
        # u8=True: uint8 conversion happens in-graph, so the device->host
        # fetch below moves 4x fewer bytes (to_uint8 passes uint8 through)
        imgs, alpha_org, orig = editor.sweep(
            walk_params, z, panels, given_w=gw, u8=True
        )
        imgs = imgmod.to_uint8(np.asarray(imgs)[:, :nb])  # [P, B, H, W, 3]
        alpha_org = np.asarray(alpha_org)[:nb]

        for ii in range(nb):
            a = float(alpha_org[ii, 0])
            panel_stack = imgs[:, ii]  # [P, H, W, 3]
            name = f"sample{batch_start + ii}_{a:.2f}"
            imgmod.save_im(
                imgmod.imgrid(panel_stack, cols=len(alphas)),
                os.path.join(output_dir, name),
            )
            print("Save in", os.path.join(output_dir, name))

    htmlmod.make_html(output_dir)
    return output_dir


def main():
    opt, conf = VisOptions().parse()
    run(opt, conf)


if __name__ == "__main__":
    main()
