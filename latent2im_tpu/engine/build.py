"""Assemble an Editor + walk from parsed options.

Replaces the reference's dispatch/factory maze (graphs/__init__.py +
graphs/transform_graph_scene.py dynamic multiple inheritance) with explicit
construction: options -> attribute vocab -> frozen towers (converted from
PyTorch checkpoints, or randomly initialized with a loud warning when no
checkpoint path is given — useful for smoke runs and benchmarking) -> Editor
+ walk params.
"""

from __future__ import annotations

import logging
import warnings

import jax
import jax.numpy as jnp

from ..config import attributes as attrs
from ..models import resnet as rn
from ..models import stylegan2 as sg2
from ..models import vgg as vggm
from ..walks import init_walk, resolve_walk_kind
from .editor import Editor, EditorConfig

DIM_Z = 512  # constants.py:2 (both backends)
RESOLUTION = 256  # constants.py:3


def _load_torch(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def build_editor_from_options(opt, seed: int = 0):
    """-> (editor, walk_params, task_info dict)."""
    from ..io import torch_convert as tc

    model = opt.model
    latent = opt.stylegan.latent if "stylegan" in model else "z"
    walk_kind = resolve_walk_kind(
        model, opt.walk_type, latent, train_embed=opt.trainEmbed,
        is_mlp=getattr(opt, "is_mlp", False),
    )
    from ..tasks.geometric import GEOMETRIC_TASKS

    if opt.transform in GEOMETRIC_TASKS:
        # steerability-lineage transforms have no regressor vocabulary —
        # one slider named after the transform (Nsliders=1 throughout the
        # reference's legacy engine); the walk trains masked-L2, and the
        # regressor/attr indices are never consulted.
        attr_list, attr_idx = [opt.transform], [0]
        attr_table = {opt.transform: 0}  # 1-output placeholder regressor head
    else:
        attr_list, attr_table = attrs.build_attr_vocab(
            opt.transform, attr_path=opt.attrPath, attr_list=opt.attrList
        )
        attr_idx = attrs.attr_indices(attr_list, attr_table)
    layers = attrs.parse_layers(opt.layers)

    key = jax.random.PRNGKey(seed)
    kg, kd, kr, kv, kw = jax.random.split(key, 5)
    size = getattr(opt, "resolution", None) or RESOLUTION
    dim_z = DIM_Z
    tiny = getattr(opt, "dev_tiny", False)
    channels = None
    n_mlp = 8
    if tiny and model != "pggan":  # the PGGAN ladder is fixed at 512-d z
        dim_z, n_mlp = 32, 2
        channels = {r: (16 if r <= 8 else 8) for r in
                    (4, 8, 16, 32, 64, 128, 256, 512, 1024)}

    synth_fn = disc_fn = None
    g_path = getattr(opt, "g_path", "")
    if model == "pggan":
        from ..models import pggan as pgg

        # step/alpha progressive forward; step 6 = 256px (constants.py:3),
        # output bilinear-downsampled x0.5 and D fed a x2 re-upsample
        # (pggan transform_base.py:311-321, :480).
        step = int(__import__("math").log2(size)) - 2
        zoo_g = None
        if g_path:
            ckpt = _load_torch(g_path)
            gsd = ckpt.get("g_running", ckpt.get("netG", ckpt)) if isinstance(
                ckpt, dict
            ) else ckpt
            if hasattr(gsd, "state_dict"):
                gsd = gsd.state_dict()
            if any("formatLayer" in k for k in gsd):
                # torch.hub GAN-zoo PGAN layout (the reference's default,
                # pggan transform_base.py:554-566)
                from ..models import pgan_zoo

                zoo_g = tc.convert_ganzoo_pgan(gsd)
                g_params = zoo_g
            else:
                g_params = tc.convert_pggan_generator(gsd)
            d_params = None
            if isinstance(ckpt, dict) and "netD" in ckpt:
                dsd = ckpt["netD"]
                if hasattr(dsd, "state_dict"):
                    dsd = dsd.state_dict()
                d_params = tc.convert_pggan_discriminator(dsd)
        else:
            warnings.warn(
                "--g_path not given: using a RANDOMLY initialized PGGAN "
                "(smoke/bench mode, not a trained model)"
            )
            g_params = pgg.init_generator(kg, n_label=0)
            d_params = None
        if d_params is None and not opt.no_gan_loss:
            d_params = pgg.init_discriminator(kd)
        cdt = jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32

        # Params arrive as the first argument (Editor passes its live
        # g_params/d_params) so the towers ride the frozen-params jit-argument
        # path instead of being baked into the program as constants.
        if zoo_g is not None:
            from ..models import pgan_zoo

            def synth_fn(g, z):
                img = pgan_zoo.generator_forward(g, z, dtype=cdt)
                return jax.image.resize(
                    img, (img.shape[0], img.shape[1] // 2, img.shape[2] // 2, 3),
                    "linear",
                )
        else:
            def synth_fn(g, z, _step=step):
                img = pgg.generator_forward(g, z, step=_step, dtype=cdt)
                return jax.image.resize(
                    img, (img.shape[0], img.shape[1] // 2, img.shape[2] // 2, 3),
                    "linear",
                )

        def disc_fn(d, img, _step=step):
            up = jax.image.resize(
                img, (img.shape[0], img.shape[1] * 2, img.shape[2] * 2, 3),
                "linear",
            )
            score, _ = pgg.discriminator_forward(d, up, step=_step, dtype=cdt)
            return score
    elif g_path:
        ckpt = _load_torch(g_path)
        g_params = tc.convert_stylegan2_generator(ckpt["g_ema"], size)
        # the checkpoint defines the latent width (512 for real rosinality
        # models; tiny test fixtures differ)
        dim_z = int(g_params["style"][0]["w"].shape[0])
        d_params = (
            tc.convert_stylegan2_discriminator(ckpt["d"], size)
            if "d" in ckpt
            else None
        )
        if d_params is None and not opt.no_gan_loss:
            d_params = sg2.init_discriminator(kd, size, channels=channels)
    else:
        warnings.warn(
            "--g_path not given: using a RANDOMLY initialized generator "
            "(smoke/bench mode, not a trained model)"
        )
        g_params = sg2.init_generator(kg, size, style_dim=dim_z, n_mlp=n_mlp,
                                      channels=channels)
        d_params = None
        if not opt.no_gan_loss:
            d_params = sg2.init_discriminator(kd, size, channels=channels)

    reg_path = getattr(opt, "reg_path", "")
    if reg_path:
        ckpt = _load_torch(reg_path)
        sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
        reg_params = tc.convert_resnet50(sd)
    else:
        warnings.warn(
            "--reg_path not given: using a RANDOMLY initialized regressor"
        )
        reg_params = rn.init_resnet50(kr, num_outputs=len(attr_table))

    vgg_path = getattr(opt, "vgg_path", "")
    if vgg_path:
        vgg_params = tc.convert_vgg_features(_load_torch(vgg_path), "vgg19")
    elif opt.no_content_loss:
        vgg_params = None
    else:
        warnings.warn("--vgg_path not given: using a RANDOMLY initialized vgg19")
        vgg_params = vggm.init_vgg(kv, "vgg19")

    cfg = EditorConfig(
        model=model,
        latent=latent,
        walk_kind=walk_kind,
        attr_list=tuple(attr_list),
        attr_idx=tuple(attr_idx),
        size=size,
        dim_z=dim_z,
        layers=layers,
        alpha_mode="delta" if model == "pggan" else "target",
        no_content_loss=opt.no_content_loss,
        no_gan_loss=opt.no_gan_loss,
        stable_bce=getattr(opt, "stable_bce", False),
        fixed_noise=getattr(opt, "fixed_noise", False),
        reg_input_size=getattr(opt, "reg_input_size", None),
        content_input_size=getattr(opt, "content_input_size", None),
        compute_dtype=jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32,
        kernel_impl=getattr(opt, "kernel_impl", None),
        remat_g=getattr(opt, "remat_g", False),
        remat_towers=getattr(opt, "remat_towers", False),
    )
    editor = Editor(cfg, g_params, reg_params=reg_params, vgg_params=vgg_params,
                    d_params=d_params, synth_fn=synth_fn, disc_fn=disc_fn)
    walk_params = init_walk(kw, walk_kind, dim_z, cfg.n_latent, attr_list)
    logging.info(
        "built editor: model=%s latent=%s walk=%s attrs=%s layers=%s",
        model, latent, walk_kind, attr_list[:4], layers,
    )
    return editor, walk_params, {
        "attr_list": attr_list,
        "attr_table": attr_table,
        "attr_idx": attr_idx,
        # provenance: which towers came from real checkpoints vs random init
        # (cli/eval.py flags identity numbers as relative-only when the
        # embedding tower is randomly initialized)
        "pretrained": {
            "g": bool(getattr(opt, "g_path", "")),
            "reg": bool(reg_path),
            "vgg": bool(vgg_path),
        },
    }


def load_editor_for_inference(opt, conf):
    """Shared inference-CLI loader (vis_w / eval / serve): apply the
    attrList/attrPath CLI overrides, build the editor, and load the optional
    walk (--save_path_w) and fine-tuned-GAN (--save_path_gan, from an
    --updateGAN run — the reference loads it via load_multi_models)
    checkpoints. Returns (editor, walk_params, info)."""
    from ..io import checkpoint as ckpt

    for field in ("attrList", "attrPath"):
        v = getattr(opt, field, None)
        if v:
            setattr(conf, field, v)
    conf.overwrite_config = True

    editor, walk_params, info = build_editor_from_options(conf)
    if getattr(opt, "save_path_w", None):
        walk_params, _, meta = ckpt.load_walk(opt.save_path_w, walk_params,
                                              attr_list=info["attr_list"])
        print(f"Load w in {opt.save_path_w} "
              f"({(meta or {}).get('source', 'native')})")
    if getattr(opt, "save_path_gan", None):
        g_new, d_new = ckpt.load_gan_checkpoint(opt.save_path_gan)
        editor.g_params = g_new
        if d_new is not None:
            editor.d_params = d_new
        print(f"Load GAN in {opt.save_path_gan}")
    return editor, walk_params, info
