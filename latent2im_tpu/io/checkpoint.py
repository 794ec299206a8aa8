"""Checkpoint save/load/resume.

The reference pickles whole torch modules per epoch with no optimizer state
and no resume (transform_base.py:492-509; SURVEY §5.4). Here checkpoints are
msgpack pytrees carrying walk params + optimizer state + progress counters,
so preempted TPU runs resume exactly; the file naming surface
(``model_w_{epoch}`` / ``model_w_{n}_final`` + ``_walk_module.ckpt``) is kept
so downstream tooling finds the same names (train.py:124-132).

Reference torch walk checkpoints are read through io.torch_convert.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    tree = jax.device_get(tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree; `like` supplies the structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(like, f.read())


def load_meta(path: str) -> dict | None:
    mp = path + ".meta.json"
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return None


def walk_ckpt_path(output_dir: str, epoch, final: bool = False) -> str:
    """model_w_{epoch}[_final]_walk_module.ckpt naming (train.py:124-132)."""
    tag = f"model_w_{epoch}_final" if final else f"model_w_{epoch}"
    return os.path.join(output_dir, f"{tag}_walk_module.ckpt")


def save_walk(
    output_dir: str,
    epoch,
    walk_params,
    opt_state=None,
    final: bool = False,
    extra_meta: dict | None = None,
) -> str:
    path = walk_ckpt_path(output_dir, epoch, final=final)
    tree = {"walk": walk_params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    meta = {"epoch": int(epoch) if isinstance(epoch, (int, np.integer)) else epoch,
            "final": final}
    meta.update(extra_meta or {})
    save_pytree(path, tree, meta)
    return path


def load_walk(path: str, walk_like, opt_state_like=None, attr_list=None):
    """-> (walk_params, opt_state|None, meta|None).

    Falls back to the reference's torch pickle format transparently;
    attr_list orders per-attribute banks for torch checkpoints (names are
    derived from the state_dict keys when omitted).
    """
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"PK" or head == b"\x80\x02" or _looks_like_torch(path):
        from .torch_convert import convert_walk_state, load_walk_checkpoint

        cls, state = load_walk_checkpoint(path)
        converted = convert_walk_state(cls, state, list(attr_list or []))
        return converted, None, {"source": "torch", "cls": cls}
    like = {"walk": walk_like}
    if opt_state_like is not None:
        like["opt_state"] = opt_state_like
    try:
        tree = load_pytree(path, like)
    except Exception:
        tree = {"walk": load_pytree(path, {"walk": walk_like})["walk"]}
    return tree["walk"], tree.get("opt_state"), load_meta(path)


def _looks_like_torch(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(8)
    return head.startswith(b"PK") or head.startswith(b"\x80")


def load_gan_checkpoint(path: str):
    """Load a fine-tuned GAN checkpoint -> (g_params, d_params|None).

    Accepts this framework's ``model_gan_{n}_final.ckpt`` msgpack pytree
    {"g", "g_running", "d"} written by the --updateGAN trainer (prefers the
    EMA ``g_running``, the standard eval choice), or a torch ``.pt`` with
    ``g_ema``/``d`` state dicts (converted on load). The reference's
    save_path_gan surface (vis_w.py --save_path_gan -> load_multi_models,
    transform_base.py:501-509).
    """
    if _looks_like_torch(path):
        import torch

        from .torch_convert import (
            convert_stylegan2_discriminator,
            convert_stylegan2_generator,
        )

        ckpt_t = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt_t.get("g_ema", ckpt_t.get("g", ckpt_t))
        # infer size from the number of to_rgbs keys
        n_rgb = len({k.split(".")[1] for k in sd if k.startswith("to_rgbs.")})
        if n_rgb == 0:
            raise ValueError(
                f"{path}: no 'to_rgbs.*' keys in the state dict — expected a "
                "rosinality-layout StyleGAN2 generator (g_ema/g) checkpoint; "
                f"top-level keys: {sorted(sd)[:8]}..."
            )
        size = 4 * 2 ** n_rgb
        g = convert_stylegan2_generator(sd, size)
        d = None
        if "d" in ckpt_t:
            d = convert_stylegan2_discriminator(ckpt_t["d"], size)
        return g, d
    tree = load_gan_state(path)
    g = tree.get("g_running", tree.get("g"))
    return g, tree.get("d")


def load_gan_state(path: str) -> dict:
    """Raw {'g', 'g_running', 'd'} dict from a GAN checkpoint written by
    cli.train._save_gan (structure-free msgpack restore)."""
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    return _relistify(tree)


# pytree keys whose values are Python LISTS in this framework's model params
# (sg2/pggan/resnet/walk trees). The digit-dict -> list conversion is scoped
# to these so a future genuinely-str-digit-keyed dict elsewhere (e.g.
# per-attribute banks named '0','1') survives a structure-free restore.
_LIST_KEYS = {"style", "convs", "to_rgbs", "noises", "blocks", "layers", "mlp",
              # pggan tree (models/pggan.py): list-of-block params
              "progression", "to_rgb", "from_rgb"}


def _relistify(tree, parent_key: str | None = None):
    """msgpack_restore returns Python lists as {'0': ..., '1': ...} dicts;
    convert those back to lists under the known list-bearing keys."""
    if isinstance(tree, dict):
        keys = list(tree)
        if parent_key in _LIST_KEYS and keys and all(k.isdigit() for k in keys):
            idx = sorted(int(k) for k in keys)
            if idx == list(range(len(idx))):
                return [_relistify(tree[str(i)], parent_key) for i in idx]
        return {k: _relistify(v, k) for k, v in tree.items()}
    return tree


def merge_walk_banks(base_walk: dict, singles: list[tuple[str, dict]],
                     attr_list: list[str]) -> dict:
    """Merge single-attribute linear-walk checkpoints into one direction bank
    (the reference's load_multi_models_from_single, transform_base.py:511-520):
    each single ckpt's first direction row replaces the bank row of the named
    attribute."""
    w = np.array(base_walk["w"])
    for name, single in singles:
        if name not in attr_list:
            raise KeyError(f"attribute {name!r} not in bank {attr_list}")
        row = np.asarray(single["w"])[0]
        w[attr_list.index(name)] = row
    out = dict(base_walk)
    out["w"] = w
    return out


def find_resume(output_dir: str) -> str | None:
    """Latest epoch checkpoint in output_dir, or None."""
    if not os.path.isdir(output_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(output_dir):
        if name.startswith("model_w_") and name.endswith("_walk_module.ckpt"):
            mid = name[len("model_w_"):-len("_walk_module.ckpt")]
            if mid.endswith("_final"):
                continue
            try:
                ep = int(mid)
            except ValueError:
                continue
            if ep > best_epoch:
                best, best_epoch = os.path.join(output_dir, name), ep
    return best
