"""Conversion-fidelity / quality-parity harness.

Two modes:

  record   — run the TORCH side (or any reference) is out of scope here;
             instead this records THIS framework's outputs for fixed seeds:
             z batch, G(z) images, regressor scores, into an .npz.
  compare  — compare a recorded .npz (from an older build, a torch-side
             export, or another machine) against the current build:
             reports max|diff|, PSNR, and a VGG-feature distance (the
             LPIPS-style perceptual proxy from BASELINE.json).

To check a PyTorch->JAX weight conversion end to end: run the reference
(PyTorch) model on the same seeds, save {'z': ..., 'images': NHWC float,
'scores': ...} as npz, then `compare` here with --g_path pointing at the
converted checkpoint.

    python -m latent2im_tpu.cli.parity_check record --out ref.npz \
        --g_path stylegan2.pt [--reg_path reg.model] [--n 8 --seed 0]
    python -m latent2im_tpu.cli.parity_check compare --ref ref.npz \
        --g_path stylegan2.pt [--reg_path reg.model]
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp


def _build(args):
    from ..config.options import TrainOptions
    from ..engine.build import build_editor_from_options

    # content loss stays ON so the VGG-feature distance column is populated
    # (random-init VGG19 when --vgg_path is absent — still a deterministic
    # perceptual-distance proxy; zero iff images match).
    argv = ["--transform", "face", "--attrList", "Smiling",
            "--attrPath", "/root/repo/dataset/attributes_celeba.txt",
            "--models_dir", "/tmp/l2i_parity", "--overwrite_config",
            "--no_gan_loss"]
    if args.g_path:
        argv += ["--g_path", args.g_path]
    if args.reg_path:
        argv += ["--reg_path", args.reg_path]
    if args.resolution:
        argv += ["--resolution", str(args.resolution)]
    if args.dev_tiny:
        argv += ["--dev_tiny"]
    opt = TrainOptions().parse(argv, print_opt=False)
    editor, _, _ = build_editor_from_options(opt)
    return editor


def _generate(editor, n, seed):
    z = np.random.RandomState(seed).randn(n, editor.cfg.dim_z).astype(np.float32)
    latent = editor.get_w(jnp.asarray(z)) if editor.cfg.latent == "w" else jnp.asarray(z)
    imgs = np.asarray(editor.synthesize(latent))
    scores = np.asarray(editor.regress_all(jnp.asarray(imgs)))
    return z, imgs, scores


def vgg_distance(editor, a, b):
    """Mean L2 distance of VGG conv_1..4 features — the LPIPS-style proxy."""
    from ..engine.losses import content_loss

    if editor.vgg_params is None:
        return float("nan")
    return float(content_loss(editor.vgg_params, jnp.asarray(a), jnp.asarray(b)))


def lpips_distance(args, a, b):
    """LPIPS-proper (models.lpips) when the official head weights are given:
    --lpips_path = PerceptualSimilarity vgg.pth, --vgg16_path = torchvision
    vgg16 features state dict. Returns per-batch mean, or None if unconfigured."""
    if not args.lpips_path or not args.vgg16_path:
        return None
    import torch

    from ..io import torch_convert as tc
    from ..models import lpips as lp

    vgg16 = tc.convert_vgg_features(
        torch.load(args.vgg16_path, map_location="cpu", weights_only=False), "vgg16"
    )
    params = tc.convert_lpips(
        torch.load(args.lpips_path, map_location="cpu", weights_only=False), vgg16
    )
    return float(jnp.mean(lp.lpips_forward(params, jnp.asarray(a), jnp.asarray(b))))


def main(argv=None):
    ap = argparse.ArgumentParser("parity check")
    ap.add_argument("mode", choices=["record", "compare"])
    ap.add_argument("--out", default="parity.npz")
    ap.add_argument("--ref", default="")
    ap.add_argument("--g_path", default="")
    ap.add_argument("--reg_path", default="")
    ap.add_argument("--vgg_path", default="")
    ap.add_argument("--lpips_path", default="",
                    help="official LPIPS vgg.pth lin-head weights")
    ap.add_argument("--vgg16_path", default="",
                    help="torchvision vgg16 features state dict (LPIPS backbone)")
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--dev_tiny", action="store_true")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    editor = _build(args)
    z, imgs, scores = _generate(editor, args.n, args.seed)

    if args.mode == "record":
        np.savez(args.out, z=z, images=imgs, scores=scores)
        print(f"recorded {args.n} samples -> {args.out}")
        return None

    ref = np.load(args.ref)
    assert np.allclose(ref["z"], z), "seed/z mismatch — use the same --seed/--n"
    a, b = ref["images"], imgs
    max_abs = float(np.max(np.abs(a - b)))
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else float("inf")  # range [-1,1]
    vggd = vgg_distance(editor, a, b)
    report = {
        "max_abs_pixel_diff": max_abs,
        "psnr_db": psnr,
        "vgg_feature_distance": vggd,
    }
    if "scores" in ref.files:  # torch-side fixtures may omit regressor scores
        report["max_abs_score_diff"] = float(
            np.max(np.abs(ref["scores"] - scores))
        )
    lpips_val = lpips_distance(args, a, b)
    if lpips_val is not None:
        report["lpips"] = lpips_val
    for k, v in report.items():
        print(f"{k}: {v:.6g}")
    return report


if __name__ == "__main__":
    main()
