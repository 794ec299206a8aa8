"""Runnable version of the README's library-API example.

Builds an ``Editor`` for the StyleGAN2 face engine, applies a single edit,
and renders a 5-panel alpha sweep to a PNG grid. With no ``--g_path`` /
``--reg_path`` the towers are randomly initialized, so the images are noise —
the point is the API surface and shapes, runnable anywhere (CPU included).

Usage:
    python examples/library_edit.py                   # tiny nets, CPU-fast
    python examples/library_edit.py --full            # real 256px tables
    python examples/library_edit.py --g_path ffhq.pt --reg_path 108_dict.model
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from latent2im_tpu.config.options import TrainOptions
from latent2im_tpu.engine.build import build_editor_from_options
from latent2im_tpu.utils.image import imgrid, save_im


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="real 256px channel table instead of --dev_tiny")
    ap.add_argument("--g_path", default="", help="converted g_ema checkpoint")
    ap.add_argument("--reg_path", default="", help="converted regressor ckpt")
    ap.add_argument("--out", default="/tmp/l2i_example")
    args = ap.parse_args()

    flags = [
        "--model", "stylegan_v2_real", "--transform", "face",
        "--walk_type", "linear", "--attrList", "Smiling",
        "--attrPath", os.path.join(os.path.dirname(__file__), "..",
                                   "dataset", "attributes_celeba.txt"),
        "--models_dir", args.out, "--overwrite_config",
    ]
    if not args.full:
        flags += ["--dev_tiny"]
    if args.g_path:
        flags += ["--g_path", args.g_path]
    if args.reg_path:
        flags += ["--reg_path", args.reg_path]
    opt = TrainOptions().parse(flags, print_opt=False)

    editor, walk, task = build_editor_from_options(opt)
    print(f"editor: {opt.model}/{opt.transform}, dim_z={editor.cfg.dim_z}, "
          f"size={editor.cfg.size}")

    z = np.random.RandomState(0).randn(2, editor.cfg.dim_z).astype("float32")

    # one edit: push the Smiling score toward 0.9
    edited, alpha_org, orig = editor.apply_alpha(walk, z, alpha_to_graph=0.9)
    print(f"apply_alpha: edited {edited.shape}, original attr scores "
          f"{np.asarray(alpha_org).ravel()[:2]}")

    # a 5-panel sweep over target alphas 0..1 (one device program)
    panels = np.linspace(0, 1, 5)[:, None] * np.ones((5, 2), "float32")
    imgs, _, _ = editor.sweep(walk, z, panels)  # [P, B, H, W, 3]
    imgs = np.asarray(imgs, dtype=np.float32)

    tiles = (np.clip(imgs.transpose(1, 0, 2, 3, 4), -1, 1).reshape(
        -1, *imgs.shape[2:]) + 1.0) / 2.0 * 255.0
    grid = imgrid(tiles.astype(np.uint8), cols=imgs.shape[0])
    os.makedirs(args.out, exist_ok=True)
    out_png = os.path.join(args.out, "sweep")  # save_im appends .png
    save_im(grid, out_png)
    print(f"wrote {out_png}.png  (rows = samples, cols = alpha panels)")


if __name__ == "__main__":
    main()
