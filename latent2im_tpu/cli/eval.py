"""Quantitative eval CLI — identity + attribute preservation.

Mirrors the reference's eval.py surface: load a training run's opt.yml + a
walk checkpoint, generate per-panel edits for each target attribute, bucket
samples by |Delta target-attr| <= 0.3/0.6/1.0, and report per-bucket

  * identity preservation (1 - mean cosine distance of face embeddings;
    facenet when --facenet_path is given, VGG-feature fallback otherwise)
  * attribute preservation (mean |Delta| over non-target regressor outputs)

    python -m latent2im_tpu.cli.eval <run_dir>/opt.yml \
        --save_path_w <run>/model_w_9_final_walk_module.ckpt \
        [--facenet_path facenet_vggface2.pt] [--num_samples 64]
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..config.options import VisOptions
from ..engine import evaluation as ev
from ..engine.build import load_editor_for_inference
from ..engine.train import sample_epoch_z
from ..utils import image as imgmod

BATCH = 8  # sweep folds P panels into the batch; 8 z x 6 panels fills 2x24-wide programs


def run(opt, conf):
    editor, walk_params, info = load_editor_for_inference(opt, conf)

    ref_parity = bool(getattr(opt, "ref_parity", False))
    facenet_path = getattr(opt, "facenet_path", "")
    if facenet_path:
        import jax
        import torch

        from ..io import torch_convert as tc
        from ..models import facenet as fn

        sd = torch.load(facenet_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        fparams = tc.convert_facenet(sd)
        embed_jit = jax.jit(lambda x: fn.facenet_forward(fparams, x))

        def embed_fn(imgs_u8):
            return embed_jit(
                ev.resize_for_embedding(imgs_u8, 160, ref_parity=ref_parity)
            )

        embed_name = "facenet-vggface2"
    else:
        print("NOTE: no --facenet_path; identity uses a VGG-feature embedding")
        embed_fn = ev.make_vgg_embed_fn(editor.vgg_params, ref_parity=ref_parity)
        embed_name = "vgg-fallback"

    # identity numbers from a randomly initialized embedding tower rank edits
    # relative to each other but are NOT comparable to any published absolute
    # identity-preservation figure
    identity_relative_only = (
        embed_name == "vgg-fallback"
        and not info.get("pretrained", {}).get("vgg", False)
    )
    if identity_relative_only:
        print("=" * 72)
        print("WARNING: the identity embedding tower is RANDOMLY INITIALIZED "
              "(no --facenet_path / --vgg_path).")
        print("Identity-preservation numbers below are RELATIVE-ONLY: valid "
              "for comparing runs of this exact build, meaningless as "
              "absolute identity scores.")
        print("=" * 72)

    from ..tasks.transforms import get_task

    from ..tasks.transforms import task_kwargs_from_options

    task = get_task(conf.transform, walk_type=conf.walk_type,
                    nsliders=len(info["attr_list"]),
                    **task_kwargs_from_options(conf))
    panel_alphas = task.test_alphas()

    # optional multi-device sharding of the eval batches (additive vs the
    # single-GPU reference): --n_devices shards batches data-parallel,
    # --sp_devices spatially partitions synthesis rows (combining as a
    # (data x spatial) mesh); identical report — equivalence-tested on the
    # virtual 8-device mesh
    from ..parallel import mesh as meshlib  # noqa: F401 — used when mesh set
    from ..parallel.spatial import setup_inference_mesh

    editor, walk_params, mesh, sp_ctx = setup_inference_mesh(
        opt, editor, walk_params
    )

    zs = sample_epoch_z(opt.num_samples, editor.cfg.dim_z, seed=opt.noise_seed)
    report = {}
    with sp_ctx:
        for a_pos, attr in enumerate(editor.cfg.attr_list):
            acc = ev.EvalAccumulator()
            for bs in range(0, opt.num_samples, BATCH):
                z = zs[bs : bs + BATCH]
                nb = z.shape[0]
                if mesh is not None:
                    z = meshlib.shard_batch(mesh, z, pad=True)
                panels = np.stack(
                    [task.scale_test_alpha(a, z.shape[0]) for a in panel_alphas]
                ).astype(np.float32)
                imgs, alpha_org, orig = editor.sweep(walk_params, z, panels)
                if z.shape[0] != nb:  # drop mesh padding rows
                    imgs, alpha_org, orig = imgs[:, :nb], alpha_org[:nb], orig[:nb]
                orig_u8 = imgmod.to_uint8(orig)
                org_all = np.asarray(editor.regress_all(orig))
                # one regressor call over all panels (flattened [P*B, ...])
                p, b = imgs.shape[0], imgs.shape[1]
                preds_all = np.asarray(
                    editor.regress_all(imgs.reshape(p * b, *imgs.shape[2:]))
                ).reshape(p, b, -1)
                for pi in range(p):
                    acc.add_batch(
                        preds_all[pi], org_all, imgmod.to_uint8(imgs[pi]), orig_u8,
                        target_idx=editor.cfg.attr_idx[a_pos],
                    )
            identity = ev.identity_preservation(acc, embed_fn)
            attr_pres = ev.attribute_preservation(acc, editor.cfg.attr_idx[a_pos])
            report[attr] = {
                "bucket_counts": acc.counts(),
                "identity_preservation": identity,
                "attribute_preservation": attr_pres,
            }
            print(f"[{attr}] buckets(<=0.3/0.6/1.0): {acc.counts()}")
            print(f"[{attr}] identity preservation ({embed_name}): {identity}")
            print(f"[{attr}] attribute preservation: {attr_pres}")

    out_dir = opt.output_dir or "."
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "eval_report.json"), "w") as f:
        json.dump(
            {
                "embedding": embed_name,
                # provenance: 'reference' = raw 0-255 PIL-BICUBIC-resized
                # inputs, bit-matching eval.py:183-190; 'whitened' = bilinear +
                # (x-127.5)/128. Numbers from the two modes must not be
                # cross-compared.
                "embedding_preprocess": "reference" if ref_parity else "whitened",
                "identity_is_relative_only": identity_relative_only,
                "results": report,
            },
            f, indent=2,
        )
    return report


def main():
    vo = VisOptions()
    vo.parser.add_argument("--facenet_path", type=str, default="")
    vo.parser.add_argument("--ref_parity", action="store_true",
                           help="feed raw 0-255 PIL-BICUBIC-resized images "
                                "to the identity embedding, bit-matching the "
                                "reference eval.py's preprocessing")
    opt, conf = vo.parse()
    run(opt, conf)


if __name__ == "__main__":
    main()
