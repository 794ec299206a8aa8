"""Real-image W+ inversion CLI (the reference's BP.py).

    python -m latent2im_tpu.cli.bp --img_dir <dir-of-images> \
        --g_path <stylegan2.pt> --save_dir ./bp_out \
        [--n_loops 500 --lr 1e-4 --optim Adam --resolution 256]

Inverts each image batch into W+ (init = mean latent), saves per-batch
latents as .npy (feedable to vis_w/eval via given_w), progress grids, and a
loss curve — the same artifact surface as BP.py:118-193.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..engine.inversion import invert, make_inverter
from ..models import stylegan2 as sg2
from ..models import vgg as vggm
from ..utils import image as imgmod


def load_images(img_dir: str, size: int) -> np.ndarray:
    """Load, center-square, resize, scale to [-1, 1] NHWC."""
    import PIL.Image

    paths = sorted(
        os.path.join(img_dir, f)
        for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
    )
    out = []
    for p in paths:
        im = PIL.Image.open(p).convert("RGB")
        w, h = im.size
        dim = min(w, h)
        im = im.crop(((w - dim) // 2, (h - dim) // 2,
                      (w - dim) // 2 + dim, (h - dim) // 2 + dim))
        im = im.resize((size, size), PIL.Image.LANCZOS)
        out.append(np.asarray(im, np.float32) / 127.5 - 1.0)
    if not out:
        raise FileNotFoundError(f"no images found in {img_dir}")
    return np.stack(out)


def main(argv=None):
    import jax

    ap = argparse.ArgumentParser("BP inversion")
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--save_dir", default="./bp_out")
    ap.add_argument("--g_path", default="",
                    help="StyleGAN2 .pt (g_ema); random init when empty (smoke)")
    ap.add_argument("--vgg16_path", default="")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--n_loops", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--optim", default="Adam", choices=["Adam", "GD"])
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--show_freq", type=int, default=500)
    ap.add_argument("--dev_tiny", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(os.path.join(args.save_dir, "latent"), exist_ok=True)

    key = jax.random.PRNGKey(0)
    if args.g_path:
        import torch

        from ..io import torch_convert as tc

        ckpt = torch.load(args.g_path, map_location="cpu", weights_only=False)
        g_params = tc.convert_stylegan2_generator(ckpt["g_ema"], args.resolution)
        # Full checkpoint surface parity (BP.py:315-332 loads g_ema AND d
        # plus both torch Adam states): the discriminator conversion is
        # exercised for validation when present — unused by the inversion
        # loss, like the reference's netD; g_optim/d_optim have no JAX
        # counterpart here because BP optimizes latents only.
        if "d" in ckpt:
            tc.convert_stylegan2_discriminator(ckpt["d"], args.resolution)
            print("loaded full checkpoint surface: g_ema + d")
        style_dim = 512
    else:
        print("WARNING: --g_path empty, random generator (smoke mode)")
        channels = {r: 8 for r in (4, 8, 16, 32, 64, 128, 256, 512, 1024)} \
            if args.dev_tiny else None
        style_dim = 32 if args.dev_tiny else 512
        g_params = sg2.init_generator(
            key, args.resolution, style_dim=style_dim,
            n_mlp=2 if args.dev_tiny else 8, channels=channels,
        )
    if args.vgg16_path:
        import torch

        from ..io import torch_convert as tc

        vgg16 = tc.convert_vgg_features(
            torch.load(args.vgg16_path, map_location="cpu", weights_only=False),
            "vgg16",
        )
    else:
        print("WARNING: --vgg16_path empty, random vgg16 (smoke mode)")
        vgg16 = vggm.init_vgg(jax.random.PRNGKey(1), "vgg16")

    imgs = load_images(args.img_dir, args.resolution)
    n_latent = sg2.n_latent(args.resolution)
    # one compile for all equal-sized batches (per-batch re-jit would pay
    # ~20s+ of G+VGG recompilation each, CLAUDE.md compile budgets)
    inverter = make_inverter(g_params, vgg16, n_latent, args.lr, args.optim)

    for bi in range(0, len(imgs), args.batch_size):
        batch = imgs[bi : bi + args.batch_size]
        imgmod.save_im(
            imgmod.imgrid(imgmod.to_uint8(batch), cols=len(batch)),
            os.path.join(args.save_dir, f"org_{bi}"),
        )

        def on_loop(loop, loss, output):
            print(f"[{loop}, {args.n_loops}]: MSE : {loss:.3f}")
            imgmod.save_im(
                imgmod.imgrid(imgmod.to_uint8(output), cols=len(batch)),
                os.path.join(args.save_dir, f"{bi}_iterations_{loop}"),
            )

        w, output, history = invert(
            g_params, vgg16, batch, n_latent,
            n_loops=args.n_loops, lr=args.lr, optim=args.optim,
            show_freq=args.show_freq, on_loop=on_loop, inverter=inverter,
        )
        imgmod.save_im(
            imgmod.imgrid(imgmod.to_uint8(output), cols=len(batch)),
            os.path.join(args.save_dir, f"{bi}_final"),
        )
        np.save(os.path.join(args.save_dir, "latent", f"{bi}_w.npy"),
                np.asarray(w))
        np.save(os.path.join(args.save_dir, f"{bi}_loss.npy"),
                np.asarray(history, np.float64))
        print("saved", os.path.join(args.save_dir, "latent", f"{bi}_w.npy"))


if __name__ == "__main__":
    main()
