"""PyTorch checkpoint -> JAX pytree converters.

Bridges the reference's checkpoint formats into this framework's NHWC param
pytrees:

  * StyleGAN2 ``.pt`` with ``g_ema`` / ``d`` state_dicts (rosinality layout,
    reference: graphs/stylegan_v2_real/transform_base.py:540-549, BP.py:315-332)
  * torchvision resnet50 regressor ``{epoch}_dict.model`` with ``{'model',
    'optm'}`` (scene_regressor_256.py:167-170)
  * torchvision vgg16/vgg19 ``features`` state_dicts
  * pickled whole-module walk checkpoints ``*_walk_module.ckpt``
    (transform_base.py:492-499) — loaded via stub class registration so the
    reference package does not need to be importable (its op/ JIT-compiles
    CUDA at import time).

Layout rules:
  conv   [out,in,kh,kw]   -> [kh,kw,in,out]
  linear [out,in]         -> [in,out]
  modconv[1,out,in,k,k]   -> [k,k,in,out]
  NCHW activations        -> NHWC (flatten-boundary weights get row-permuted)

torch is only imported inside functions: the training/inference paths never
need it; converters are a host-side one-time step.
"""

from __future__ import annotations

import sys
from typing import Any

import numpy as np


def _np(t):
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy().astype(np.float32)
    return np.asarray(t, dtype=np.float32)


def _conv_w(t):
    return np.transpose(_np(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _lin_w(t):
    return np.transpose(_np(t), (1, 0))  # [out,in] -> [in,out]


def _modconv_w(t):
    return np.transpose(_np(t)[0], (2, 3, 1, 0))  # [1,O,I,k,k] -> [k,k,I,O]


# ---------------------------------------------------------------------------
# StyleGAN2
# ---------------------------------------------------------------------------


def convert_stylegan2_generator(sd: dict, size: int, n_mlp: int | None = None) -> dict:
    """rosinality g_ema state_dict -> models.stylegan2 generator pytree.

    n_mlp is inferred from the style.N.* keys when omitted (style.0 is the
    PixelNorm in the reference's Sequential, so linears start at 1)."""
    import math

    if n_mlp is None:
        n_mlp = sum(1 for k in sd if k.startswith("style.") and k.endswith(".weight"))
    log_size = int(math.log2(size))
    params: dict[str, Any] = {
        "style": [
            {
                "w": _lin_w(sd[f"style.{i + 1}.weight"]),
                "b": _np(sd[f"style.{i + 1}.bias"]),
            }
            for i in range(n_mlp)
        ],
        "const": np.transpose(_np(sd["input.input"]), (0, 2, 3, 1)),
    }

    def styled_conv(prefix):
        return {
            "conv": {
                "w": _modconv_w(sd[f"{prefix}.conv.weight"]),
                "mod": {
                    "w": _lin_w(sd[f"{prefix}.conv.modulation.weight"]),
                    "b": _np(sd[f"{prefix}.conv.modulation.bias"]),
                },
            },
            "noise_w": _np(sd[f"{prefix}.noise.weight"]).reshape(()),
            "act_b": _np(sd[f"{prefix}.activate.bias"]),
        }

    def to_rgb(prefix):
        return {
            "conv": {
                "w": _modconv_w(sd[f"{prefix}.conv.weight"]),
                "mod": {
                    "w": _lin_w(sd[f"{prefix}.conv.modulation.weight"]),
                    "b": _np(sd[f"{prefix}.conv.modulation.bias"]),
                },
            },
            "b": _np(sd[f"{prefix}.bias"]).reshape(-1),
        }

    params["conv1"] = styled_conv("conv1")
    params["to_rgb1"] = to_rgb("to_rgb1")
    n_blocks = log_size - 2
    params["convs"] = [styled_conv(f"convs.{i}") for i in range(n_blocks * 2)]
    params["to_rgbs"] = [to_rgb(f"to_rgbs.{i}") for i in range(n_blocks)]
    n_noise = (log_size - 2) * 2 + 1
    params["noises"] = [
        np.transpose(_np(sd[f"noises.noise_{i}"]), (0, 2, 3, 1))
        for i in range(n_noise)
    ]
    return params


def convert_stylegan2_discriminator(sd: dict, size: int) -> dict:
    """rosinality D state_dict -> models.stylegan2 discriminator pytree."""
    import math

    log_size = int(math.log2(size))

    def conv_layer(prefix, down: bool, bias: bool = True, activate: bool = True):
        # Sequential indices: [Blur?, EqualConv2d, FusedLeakyReLU?]
        ci = 1 if down else 0
        p = {"conv": {"w": _conv_w(sd[f"{prefix}.{ci}.weight"])}}
        if activate and bias:
            p["act_b"] = _np(sd[f"{prefix}.{ci + 1}.bias"])
        elif bias and not activate and f"{prefix}.{ci}.bias" in sd:
            p["conv"]["b"] = _np(sd[f"{prefix}.{ci}.bias"])
        return p

    params: dict[str, Any] = {
        "from_rgb": conv_layer("convs.0", down=False),
        "blocks": [],
    }
    n_blocks = log_size - 2
    for i in range(n_blocks):
        pre = f"convs.{i + 1}"
        params["blocks"].append(
            {
                "conv1": conv_layer(f"{pre}.conv1", down=False),
                "conv2": conv_layer(f"{pre}.conv2", down=True),
                "skip": conv_layer(f"{pre}.skip", down=True, bias=False, activate=False),
            }
        )
    params["final_conv"] = conv_layer("final_conv", down=False)

    # final_linear.0 consumes the NCHW flatten (c,h,w); our NHWC flatten is
    # (h,w,c) — permute the weight's input rows accordingly.
    w0 = _lin_w(sd["final_linear.0.weight"])  # [C*16, 512] rows in (c,h,w) order
    cin = w0.shape[0] // 16
    idx = np.arange(w0.shape[0]).reshape(cin, 4, 4)  # [c,h,w] -> torch row id
    perm = np.transpose(idx, (1, 2, 0)).reshape(-1)  # (h,w,c) order
    params["final_lin1"] = {"w": w0[perm], "b": _np(sd["final_linear.0.bias"])}
    params["final_lin2"] = {
        "w": _lin_w(sd["final_linear.1.weight"]),
        "b": _np(sd["final_linear.1.bias"]),
    }
    return params


# ---------------------------------------------------------------------------
# PGGAN (local model_256.py checkpoints)
# ---------------------------------------------------------------------------


def strip_module_prefix(sd: dict) -> dict:
    """DataParallel checkpoints carry 'module.' prefixes
    (pggan transform_base.py:568-597)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def convert_pggan_generator(sd: dict) -> dict:
    """graphs/pggan/model_256.py Generator state_dict -> models.pggan pytree.

    EqualLR renames weights to 'weight_orig' (model_256.py:80-89); plain
    to_rgb convs keep 'weight'.
    """
    sd = strip_module_prefix(sd)
    from ..models.pggan import G_LADDER

    params: dict[str, Any] = {
        "label_embed": _np(sd["label_embed.weight"]),
        "progression": [],
        "to_rgb": [],
    }
    for i in range(len(G_LADDER)):
        pre = f"progression.{i}.conv"
        params["progression"].append(
            {
                "conv1": {"w": _conv_w(sd[f"{pre}.0.conv.weight_orig"]),
                          "b": _np(sd[f"{pre}.0.conv.bias"])},
                "conv2": {"w": _conv_w(sd[f"{pre}.3.conv.weight_orig"]),
                          "b": _np(sd[f"{pre}.3.conv.bias"])},
            }
        )
        params["to_rgb"].append(
            {"w": _conv_w(sd[f"to_rgb.{i}.weight"]),
             "b": _np(sd[f"to_rgb.{i}.bias"])}
        )
    return params


def convert_ganzoo_pgan(sd: dict) -> dict:
    """pytorch_GAN_zoo GNet state_dict -> models.pgan_zoo pytree.

    Accepts the hub checkpoint's netG sub-dict (keys 'formatLayer.module.*',
    'groupScale0.N.module.*', 'scaleLayers.S.N.module.*',
    'toRGBLayers.S.module.*'); the depth ladder is inferred from shapes.
    """
    sd = strip_module_prefix(sd)

    def lin(prefix):
        return {"w": _lin_w(sd[f"{prefix}.module.weight"]),
                "b": _np(sd[f"{prefix}.module.bias"])}

    def conv(prefix):
        return {"w": _conv_w(sd[f"{prefix}.module.weight"]),
                "b": _np(sd[f"{prefix}.module.bias"])}

    params: dict[str, Any] = {
        "format": lin("formatLayer"),
        "group_scale0": [],
        "scales": [],
        "to_rgbs": [],
    }
    i = 0
    while f"groupScale0.{i}.module.weight" in sd:
        params["group_scale0"].append(conv(f"groupScale0.{i}"))
        i += 1
    s = 0
    while f"scaleLayers.{s}.0.module.weight" in sd:
        group = []
        j = 0
        while f"scaleLayers.{s}.{j}.module.weight" in sd:
            group.append(conv(f"scaleLayers.{s}.{j}"))
            j += 1
        params["scales"].append(group)
        s += 1
    t = 0
    while f"toRGBLayers.{t}.module.weight" in sd:
        params["to_rgbs"].append(conv(f"toRGBLayers.{t}"))
        t += 1
    return params


def convert_pggan_discriminator(sd: dict) -> dict:
    sd = strip_module_prefix(sd)
    from ..models.pggan import D_LADDER

    params: dict[str, Any] = {"progression": [], "from_rgb": []}
    n = len(D_LADDER)
    for i in range(n):
        pre = f"progression.{i}.conv"
        params["progression"].append(
            {
                "conv1": {"w": _conv_w(sd[f"{pre}.0.conv.weight_orig"]),
                          "b": _np(sd[f"{pre}.0.conv.bias"])},
                "conv2": {"w": _conv_w(sd[f"{pre}.2.conv.weight_orig"]),
                          "b": _np(sd[f"{pre}.2.conv.bias"])},
            }
        )
        params["from_rgb"].append(
            {"w": _conv_w(sd[f"from_rgb.{i}.weight"]),
             "b": _np(sd[f"from_rgb.{i}.bias"])}
        )
    params["linear"] = {"w": _lin_w(sd["linear.weight"]), "b": _np(sd["linear.bias"])}
    return params


# ---------------------------------------------------------------------------
# LPIPS (official PerceptualSimilarity vgg.pth lin heads)
# ---------------------------------------------------------------------------


def convert_lpips(lin_sd: dict, vgg_params: dict) -> dict:
    """Official LPIPS 'vgg' weights -> models.lpips pytree.

    lin_sd: the released vgg.pth (keys ``lin{i}.model.1.weight`` [1,C,1,1];
    some packagings use ``lins.{i}.model.1.weight``). vgg_params: a converted
    torchvision vgg16 tree (the backbone ships separately — the official file
    holds only the learned heads)."""
    from ..models.lpips import LPIPS_CHANNELS

    lins = []
    for i, c in enumerate(LPIPS_CHANNELS):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in lin_sd:
                w = _np(lin_sd[k]).reshape(-1)
                break
        else:
            raise KeyError(f"LPIPS lin head {i} not found in state dict")
        if w.shape[0] != c:
            raise ValueError(f"lin{i} has {w.shape[0]} channels, expected {c}")
        lins.append({"w": w})
    assert vgg_params["cfg"] == "vgg16", "LPIPS-vgg uses a vgg16 backbone"
    return {"vgg": vgg_params, "lins": lins}


# ---------------------------------------------------------------------------
# torchvision resnet50 / vgg
# ---------------------------------------------------------------------------


def convert_resnet50(sd: dict) -> dict:
    """torchvision resnet50 (fc -> num_outputs) state_dict -> pytree."""

    def bn(prefix):
        return {
            "gamma": _np(sd[f"{prefix}.weight"]),
            "beta": _np(sd[f"{prefix}.bias"]),
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }

    params: dict[str, Any] = {
        "stem": {"w": _conv_w(sd["conv1.weight"]), **bn("bn1")},
        "layers": [],
    }
    from ..models.resnet import BOTTLENECK_LAYERS

    for li, n_blocks in enumerate(BOTTLENECK_LAYERS):
        blocks = []
        for bi in range(n_blocks):
            pre = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": {"w": _conv_w(sd[f"{pre}.conv1.weight"]), **bn(f"{pre}.bn1")},
                "conv2": {"w": _conv_w(sd[f"{pre}.conv2.weight"]), **bn(f"{pre}.bn2")},
                "conv3": {"w": _conv_w(sd[f"{pre}.conv3.weight"]), **bn(f"{pre}.bn3")},
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["down"] = {
                    "w": _conv_w(sd[f"{pre}.downsample.0.weight"]),
                    **bn(f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        params["layers"].append(blocks)
    params["fc"] = {"w": _lin_w(sd["fc.weight"]), "b": _np(sd["fc.bias"])}
    return params


def convert_vgg_features(sd: dict, cfg_name: str) -> dict:
    """torchvision vgg16/vgg19 ``features`` state_dict -> pytree.

    Accepts keys either as 'features.IDX.weight' or bare 'IDX.weight'.
    """
    from ..models.vgg import CFGS

    cfg = CFGS[cfg_name]

    def get(idx, kind):
        for k in (f"features.{idx}.{kind}", f"{idx}.{kind}"):
            if k in sd:
                return sd[k]
        raise KeyError(f"vgg key {idx}.{kind} not found")

    convs = []
    seq_idx = 0
    for v in cfg:
        if v == "M":
            seq_idx += 1  # MaxPool2d
            continue
        convs.append({"w": _conv_w(get(seq_idx, "weight")), "b": _np(get(seq_idx, "bias"))})
        seq_idx += 2  # Conv2d + ReLU
    return {"cfg": cfg_name, "convs": convs}


def export_resnet50_torch(params: dict) -> dict:
    """Inverse of convert_resnet50: pytree -> torchvision-layout state_dict
    (torch tensors), so checkpoints from the regressor trainer load in the
    reference's torch pipeline too."""
    import torch

    sd: dict = {}

    def put_bn(prefix, p):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(p["gamma"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["beta"]))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.asarray(p["mean"]))
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.asarray(p["var"]))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.int64)

    def conv_w_inv(w):
        return torch.from_numpy(np.transpose(np.asarray(w), (3, 2, 0, 1)))

    sd["conv1.weight"] = conv_w_inv(params["stem"]["w"])
    put_bn("bn1", params["stem"])
    for li, blocks in enumerate(params["layers"]):
        for bi, blk in enumerate(blocks):
            pre = f"layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                sd[f"{pre}.conv{ci}.weight"] = conv_w_inv(blk[f"conv{ci}"]["w"])
                put_bn(f"{pre}.bn{ci}", blk[f"conv{ci}"])
            if "down" in blk:
                sd[f"{pre}.downsample.0.weight"] = conv_w_inv(blk["down"]["w"])
                put_bn(f"{pre}.downsample.1", blk["down"])
    sd["fc.weight"] = torch.from_numpy(np.transpose(np.asarray(params["fc"]["w"])))
    sd["fc.bias"] = torch.from_numpy(np.asarray(params["fc"]["b"]))
    return sd


# ---------------------------------------------------------------------------
# facenet InceptionResnetV1 (facenet_pytorch layout)
# ---------------------------------------------------------------------------


def convert_facenet(sd: dict) -> dict:
    """facenet_pytorch InceptionResnetV1 state_dict -> models.facenet pytree."""

    def basic(prefix):
        return {
            "w": _conv_w(sd[f"{prefix}.conv.weight"]),
            "bn": {
                "gamma": _np(sd[f"{prefix}.bn.weight"]),
                "beta": _np(sd[f"{prefix}.bn.bias"]),
                "mean": _np(sd[f"{prefix}.bn.running_mean"]),
                "var": _np(sd[f"{prefix}.bn.running_var"]),
            },
        }

    def conv_b(prefix):
        return {
            "w": _conv_w(sd[f"{prefix}.weight"]),
            "b": _np(sd[f"{prefix}.bias"]),
        }

    p: dict[str, Any] = {
        name: basic(name)
        for name in ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
                     "conv2d_4a", "conv2d_4b")
    }
    p["repeat_1"] = [
        {
            "branch0": basic(f"repeat_1.{i}.branch0"),
            "branch1": [basic(f"repeat_1.{i}.branch1.{j}") for j in range(2)],
            "branch2": [basic(f"repeat_1.{i}.branch2.{j}") for j in range(3)],
            "conv2d": conv_b(f"repeat_1.{i}.conv2d"),
        }
        for i in range(5)
    ]
    p["mixed_6a"] = {
        "branch0": basic("mixed_6a.branch0"),
        "branch1": [basic(f"mixed_6a.branch1.{j}") for j in range(3)],
    }
    p["repeat_2"] = [
        {
            "branch0": basic(f"repeat_2.{i}.branch0"),
            "branch1": [basic(f"repeat_2.{i}.branch1.{j}") for j in range(3)],
            "conv2d": conv_b(f"repeat_2.{i}.conv2d"),
        }
        for i in range(10)
    ]
    p["mixed_7a"] = {
        f"branch{k}": [basic(f"mixed_7a.branch{k}.{j}")
                       for j in range((2, 2, 3)[k])]
        for k in range(3)
    }
    blocks = [
        {
            "branch0": basic(f"repeat_3.{i}.branch0"),
            "branch1": [basic(f"repeat_3.{i}.branch1.{j}") for j in range(3)],
            "conv2d": conv_b(f"repeat_3.{i}.conv2d"),
        }
        for i in range(5)
    ]
    blocks.append(
        {
            "branch0": basic("block8.branch0"),
            "branch1": [basic(f"block8.branch1.{j}") for j in range(3)],
            "conv2d": conv_b("block8.conv2d"),
        }
    )
    p["repeat_3"] = blocks
    p["last_linear"] = {"w": _lin_w(sd["last_linear.weight"])}
    p["last_bn"] = {
        "gamma": _np(sd["last_bn.weight"]),
        "beta": _np(sd["last_bn.bias"]),
        "mean": _np(sd["last_bn.running_mean"]),
        "var": _np(sd["last_bn.running_var"]),
    }
    return p


# ---------------------------------------------------------------------------
# walk checkpoints (pickled whole nn.Modules)
# ---------------------------------------------------------------------------

_WALK_CLASS_NAMES = [
    "WalkEmbed",
    "WalkLinear",
    "WalkMlpMultiZ",
    "WalkLinearMultiW",
    "WalkMlpMultiW",
    "WalkNonLinearW",
    "WalkLinearZ",
    "WalkLinearZ_free",
    "WalkMlpZ",
    "WalkMlpZ2",
    "WalkMlpZ3",
    "walk_embed",
]

_REF_MODULES = [
    "graphs",
    "graphs.stylegan_v2_real",
    "graphs.stylegan_v2_real.transform_base",
    "graphs.pggan",
    "graphs.pggan.transform_base",
]


def _register_walk_stubs():
    """Register stub modules/classes so pickled reference walk modules load
    without importing the reference package (whose op/ JIT-builds CUDA)."""
    import types

    import torch.nn as nn

    for mod_name in _REF_MODULES:
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    for mod_name in _REF_MODULES[2::2] + [_REF_MODULES[4]]:
        mod = sys.modules[mod_name]
        for cls_name in _WALK_CLASS_NAMES:
            if not hasattr(mod, cls_name):
                # Unpickling never calls __init__; a bare nn.Module subclass
                # with the right qualified name is enough to restore state.
                cls = type(
                    cls_name,
                    (nn.Module,),
                    {"__module__": mod_name, "__qualname__": cls_name},
                )
                setattr(mod, cls_name, cls)


def load_walk_checkpoint(path: str) -> tuple[str, dict]:
    """Load a reference ``*_walk_module.ckpt`` -> (class_name, state arrays)."""
    import torch

    _register_walk_stubs()
    obj = torch.load(path, map_location="cpu", weights_only=False)
    cls = type(obj).__name__
    state = {k: _np(v) for k, v in obj.state_dict().items()}
    return cls, state


def convert_walk_state(cls: str, state: dict, attr_list: list[str]) -> dict:
    """Map a reference walk module state_dict onto this framework's walk
    param pytrees (see walks/walks.py for the target layouts)."""
    if cls == "WalkLinearMultiW":
        return {"w": state["w"]}  # [A, L, 512] identical layout
    if cls == "WalkMlpMultiW":
        return {
            "mlp": [
                {"w": _lin_w(state[f"linear.{i}.weight"]),
                 "b": _np(state[f"linear.{i}.bias"])}
                for i in (0, 2, 4)
            ]
        }
    if cls == "WalkNonLinearW":
        return {
            "embed": {"w": _lin_w(state["embed.weight"]), "b": _np(state["embed.bias"])},
            "mlp": [
                {"w": _lin_w(state[f"linear.{i}.weight"]),
                 "b": _np(state[f"linear.{i}.bias"])}
                for i in (0, 2)
            ],
        }
    if cls == "WalkMlpMultiZ":
        # stylegan z-space MLP walk (transform_base.py:86-111): embed(10->D)
        # concat z -> Linear stack at Sequential indices 0, 2, 4 — same layout
        # as walks.init_mlp_z.
        return {
            "embed": {"w": _lin_w(state["embed.weight"]),
                      "b": _np(state["embed.bias"])},
            "mlp": [
                {"w": _lin_w(state[f"linear.{i}.weight"]),
                 "b": _np(state[f"linear.{i}.bias"])}
                for i in (0, 2, 4)
            ],
        }
    if cls == "WalkLinear":
        # stylegan z-space direction bank (transform_base.py:66-83):
        # ParameterDict keyed by attr name, each [1, D, Nsliders].
        names = list(attr_list) or sorted(
            {k.split(".", 1)[1] for k in state if k.startswith("w.")}
        )
        if not names:
            raise ValueError("WalkLinear checkpoint has no direction banks")
        rows = []
        for n in names:
            bank = state[f"w.{n}"]  # [1, D, Nsliders]
            if bank.shape[-1] != 1:
                raise ValueError(
                    f"WalkLinear attr {n!r} has Nsliders={bank.shape[-1]}; "
                    "only Nsliders=1 maps onto the linear_z_dir layout"
                )
            rows.append(bank[0, :, 0])
        return {"w": np.stack(rows)}
    if cls == "WalkLinearZ":
        # pggan normalized-linear z walk (pggan transform_base.py:63-83):
        # a single nn.Linear(D, D) -> walks.linear_z layout
        return {"lin": {"w": _lin_w(state["linear.weight"]),
                        "b": _np(state["linear.bias"])}}
    if cls == "WalkLinearZ_free":
        return {"w": state["w"]}  # [A, 512]
    if cls in ("WalkMlpZ3", "WalkMlpZ2", "WalkMlpZ"):
        idxs = [i for i in range(0, 12, 2) if f"linear.{i}.weight" in state]
        return {
            "mlp": [
                {"w": _lin_w(state[f"linear.{i}.weight"]),
                 "b": _np(state[f"linear.{i}.bias"])}
                for i in idxs
            ]
        }
    if cls in ("WalkEmbed", "walk_embed"):
        key = "w" if any(k.startswith("w.") for k in state) else "w_embed"
        names = list(attr_list) or sorted(
            {k.split(".", 1)[1] for k in state if k.startswith(f"{key}.")}
        )
        bank = {name: state[f"{key}.{name}"] for name in names
                if f"{key}.{name}" in state}
        if not bank:
            raise ValueError(
                f"WalkEmbed checkpoint has no banks matching attrs {names}"
            )
        return {"w": bank}
    raise ValueError(f"unknown walk checkpoint class: {cls}")


# ---------------------------------------------------------------------------
# reverse export: walk param pytrees -> reference *_walk_module.ckpt pickles
# ---------------------------------------------------------------------------


def export_walk_torch(path: str, kind: str, params: dict,
                      attr_list: list[str] | None = None,
                      nsliders: int = 1) -> None:
    """Save a walk trained HERE as the reference's pickled-module checkpoint
    (torch.save(self.walk, save_path_w + '_walk_module.ckpt'),
    transform_base.py:492-505), loadable by reference tooling.

    The reference pickles the WHOLE nn.Module, so the pickle stores the
    class's qualified name plus the module __dict__. We build an instance of
    the matching stub class (same qualified name the reference classes have;
    _register_walk_stubs) carrying real torch parameters/submodules in the
    reference's exact attribute layout — unpickling in the reference
    environment resolves the REAL class and restores this state onto it,
    and load_walk_checkpoint here round-trips it (convert_walk_state is the
    inverse mapping)."""
    import sys as _sys

    import torch
    import torch.nn as nn

    _register_walk_stubs()

    def t(a):
        # np.array copies: jax arrays expose read-only buffers torch warns on
        return torch.from_numpy(np.array(a, np.float32))

    def p(a):
        return nn.Parameter(t(a))

    def lin(layer):  # ours [in,out] -> torch Linear [out,in]
        w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
        m = nn.Linear(w.shape[0], w.shape[1])
        m.weight = p(w.T)
        m.bias = p(b)
        return m

    def seq(layers):  # Sequential(Linear, LeakyReLU, ..., Linear)
        mods = []
        for i, l in enumerate(layers):
            mods.append(lin(l))
            if i < len(layers) - 1:
                mods.append(nn.LeakyReLU(0.2, True))
        return nn.Sequential(*mods)

    sg = "graphs.stylegan_v2_real.transform_base"
    pg = "graphs.pggan.transform_base"
    table = {  # kind -> (reference class, reference module)
        "linear_w": ("WalkLinearMultiW", sg),
        "mlp_w": ("WalkMlpMultiW", sg),
        "nn_w": ("WalkNonLinearW", sg),
        "mlp_z": ("WalkMlpMultiZ", sg),
        "linear_z_dir": ("WalkLinear", sg),
        "embed": ("WalkEmbed", sg),
        "linear_z_free": ("WalkLinearZ_free", pg),
        "linear_z": ("WalkLinearZ", pg),
        "mlp_z_norm": ("WalkMlpZ2", pg),
        "mlp_z3": ("WalkMlpZ3", pg),
    }
    if kind not in table:
        raise ValueError(f"no reference checkpoint format for walk kind {kind!r}")
    cls_name, mod_name = table[kind]
    m = getattr(_sys.modules[mod_name], cls_name)()
    m.Nsliders = nsliders

    if kind == "linear_w":
        w = np.asarray(params["w"])  # [A, L, D] — identical layout
        m.w = p(w)
        m.dim_z, m.step = w.shape[2], w.shape[1] // 2 - 1
    elif kind == "mlp_w":
        m.linear = seq(params["mlp"])
        m.dim_z = np.asarray(params["mlp"][0]["w"]).shape[0]
    elif kind == "nn_w":
        m.embed = lin(params["embed"])
        m.linear = seq(params["mlp"])
        m.dim_z = np.asarray(params["embed"]["b"]).shape[0] * 2
    elif kind == "mlp_z":
        m.embed = lin(params["embed"])
        m.linear = seq(params["mlp"])
        m.dim_z = np.asarray(params["embed"]["b"]).shape[0]
        direction = np.zeros((1, 10), np.float32)
        direction[0, 0] = 1
        m.direction = t(direction)
    elif kind == "linear_z_dir":
        w = np.asarray(params["w"])  # [A, D] -> ParameterDict of [1, D, 1]
        names = list(attr_list or [f"attr{i}" for i in range(w.shape[0])])
        m.w = nn.ParameterDict({n: p(w[i][None, :, None])
                                for i, n in enumerate(names)})
        m.dim_z = w.shape[1]
    elif kind == "embed":
        m.w = nn.ParameterDict({n: p(params["w"][n]) for n in params["w"]})
        m.dim_z = next(iter(params["w"].values())).shape[2]
    elif kind == "linear_z_free":
        m.w = p(params["w"])
        m.dim_z = np.asarray(params["w"]).shape[1]
    elif kind == "linear_z":
        m.linear = lin(params["lin"])
        m.dim_z = np.asarray(params["lin"]["b"]).shape[0]
    else:  # mlp_z_norm / mlp_z3
        m.linear = seq(params["mlp"])
        m.dim_z = np.asarray(params["mlp"][0]["w"]).shape[0]
    m.step = getattr(m, "step", None)
    torch.save(m, path)
