"""Trainable latent-walk modules — the only trained parameters in the system.

Re-creates every walk family from the reference as (init, apply) pairs over
param pytrees, with a registry keyed by a walk kind string:

  W-space (StyleGAN2; reference graphs/stylegan_v2_real/transform_base.py:21-243)
    linear_w   WalkLinearMultiW  — per-attribute direction bank [A, L, D],
                                   w[l] += alpha @ W[:, l, :]
    mlp_w      WalkMlpMultiW     — D->2D->2D->D LeakyReLU MLP,
                                   w[l] += alpha_0 * MLP(w[l])
    nn_w       WalkNonLinearW    — alpha-embed(10->D/2) ++ w[l] -> MLP,
                                   unit-normalized delta
  z-space (StyleGAN2 z / PGGAN; graphs/pggan/transform_base.py:12-188)
    mlp_z      WalkMlpMultiZ     — one-hot embed(10->D) ++ z -> MLP,
                                   normalized delta * alpha_0
    linear_z_free  WalkLinearZ_free — elementwise gate z += alpha*(z*w_a)
    linear_z   WalkLinearZ       — z += alpha * 3 * Lin(z)/||Lin(z)||
    mlp_z3     WalkMlpZ3         — z += alpha * MLP(z)   (paper's PGGAN walk)
    embed      WalkEmbed         — discrete per-attribute embedding bank

W-space walks take latent [B, L, D] (the W+ stack) and alpha [B, A];
z-space walks take latent [B, D]. `layers` is an optional static tuple of
layer indices restricting which W+ layers move (transform_base.py:151-165).

All inits mirror the reference's distributions (directions ~ N(0, 0.02),
nn.Linear default U(-1/sqrt(fan_in), ...)).
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict[str, Any]


def _init_linear(key, fan_in, fan_out):
    """torch nn.Linear default init: U(-b, b), b = 1/sqrt(fan_in)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _mlp(layers, x, slope=0.2):
    for i, p in enumerate(layers):
        x = _linear(p, x)
        if i < len(layers) - 1:
            x = jax.nn.leaky_relu(x, slope)
    return x


def _layer_mask(n_layers: int, layers) -> jnp.ndarray:
    if layers is None:
        return jnp.ones((n_layers,), jnp.float32)
    mask = jnp.zeros((n_layers,), jnp.float32)
    return mask.at[jnp.asarray(tuple(layers))].set(1.0)


# ---------------------------------------------------------------------------
# W-space walks
# ---------------------------------------------------------------------------


def init_linear_w(key, dim_z, n_layers, attr_list, nsliders=1):
    return {
        "w": 0.02 * jax.random.normal(
            key, (len(attr_list), n_layers, dim_z), jnp.float32
        )
    }


def apply_linear_w(params, latent, alpha, layers=None):
    # latent [B, L, D], alpha [B, A], w [A, L, D]
    delta = jnp.einsum("ba,ald->bld", alpha, params["w"].astype(latent.dtype))
    mask = _layer_mask(latent.shape[1], layers).astype(latent.dtype)
    return latent + delta * mask[None, :, None]


def init_mlp_w(key, dim_z, n_layers, attr_list, nsliders=1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp": [
            _init_linear(k1, dim_z, 2 * dim_z),
            _init_linear(k2, 2 * dim_z, 2 * dim_z),
            _init_linear(k3, 2 * dim_z, dim_z),
        ]
    }


def apply_mlp_w(params, latent, alpha, layers=None):
    al = alpha[:, :1]  # the reference uses alpha[:, 0] (transform_base.py:184)
    delta = _mlp(params["mlp"], latent)  # batched over [B, L, D]
    mask = _layer_mask(latent.shape[1], layers).astype(latent.dtype)
    return latent + al[:, None, :] * delta * mask[None, :, None]


def init_nn_w(key, dim_z, n_layers, attr_list, nsliders=1):
    ke, k1, k2 = jax.random.split(key, 3)
    return {
        "embed": _init_linear(ke, 10, dim_z // 2),
        "mlp": [
            _init_linear(k1, dim_z // 2 + dim_z, 2 * dim_z),
            _init_linear(k2, 2 * dim_z, dim_z),
        ],
    }


def apply_nn_w(params, latent, alpha, layers=None):
    b, n_layers, d = latent.shape
    al = alpha[:, :1]
    emb = _linear(params["embed"], jnp.tile(al, (1, 10)))  # [B, D/2]
    emb_l = jnp.broadcast_to(emb[:, None, :], (b, n_layers, emb.shape[-1]))
    h = jnp.concatenate([emb_l, latent], axis=-1)
    delta = _mlp(params["mlp"], h)
    if layers is None:
        # unit-normalized per layer (transform_base.py:228)
        delta = delta / jnp.linalg.norm(delta, axis=-1, keepdims=True)
        return latent + delta
    mask = _layer_mask(n_layers, layers).astype(latent.dtype)
    # with an explicit layer subset the reference skips normalization (:236-238)
    return latent + delta * mask[None, :, None]


# ---------------------------------------------------------------------------
# z-space walks
# ---------------------------------------------------------------------------


def init_mlp_z(key, dim_z, n_layers, attr_list, nsliders=1):
    ke, k1, k2, k3 = jax.random.split(key, 4)
    return {
        "embed": _init_linear(ke, 10, dim_z),
        "mlp": [
            _init_linear(k1, 2 * dim_z, dim_z),
            _init_linear(k2, dim_z, dim_z),
            _init_linear(k3, dim_z, dim_z),
        ],
    }


def apply_mlp_z(params, z, alpha, layers=None):
    al = alpha[:, :1]
    direction = jnp.zeros((z.shape[0], 10), z.dtype).at[:, 0].set(1.0)
    emb = _linear(params["embed"], direction)
    out = _mlp(params["mlp"], jnp.concatenate([emb, z], axis=-1))
    out = al * out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    return z + out


def init_linear_z_free(key, dim_z, n_layers, attr_list, nsliders=1):
    return {"w": 0.02 * jax.random.normal(key, (len(attr_list), dim_z), jnp.float32)}


def apply_linear_z_free(params, z, alpha, layers=None):
    # elementwise gate per attribute: delta = sum_a alpha[:,a] * z * w[a]
    # (reduces to the reference's `al * input * w` for a single attribute,
    # pggan transform_base.py:98-102)
    gate = alpha @ params["w"].astype(z.dtype)  # [B, D]
    return z + gate * z


def init_linear_z(key, dim_z, n_layers, attr_list, nsliders=1):
    return {"lin": _init_linear(key, dim_z, dim_z)}


def apply_linear_z(params, z, alpha, layers=None):
    al = alpha[:, :1]
    out = _linear(params["lin"], z)
    direction = al * out / jnp.linalg.norm(out, axis=-1, keepdims=True) * 3.0
    return z + direction


def init_linear_z_dir(key, dim_z, n_layers, attr_list, nsliders=1):
    """Per-slider direction bank in z (the stylegan backend's WalkLinear,
    transform_base.py:66-83): z + alpha @ W, W [A, D]."""
    return {"w": 0.02 * jax.random.normal(key, (len(attr_list), dim_z), jnp.float32)}


def apply_linear_z_dir(params, z, alpha, layers=None):
    return z + alpha @ params["w"].astype(z.dtype)


def init_mlp_z_norm(key, dim_z, n_layers, attr_list, nsliders=1):
    """WalkMlpZ2 (pggan transform_base.py:136-165): D->2D->2D->D MLP with
    unit-normalized delta scaled x3."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp": [
            _init_linear(k1, dim_z, 2 * dim_z),
            _init_linear(k2, 2 * dim_z, 2 * dim_z),
            _init_linear(k3, 2 * dim_z, dim_z),
        ]
    }


def apply_mlp_z_norm(params, z, alpha, layers=None):
    al = alpha[:, :1]
    out = _mlp(params["mlp"], z)
    out = al * out / jnp.linalg.norm(out, axis=-1, keepdims=True) * 3.0
    return z + out


def init_mlp_z3(key, dim_z, n_layers, attr_list, nsliders=1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "mlp": [
            _init_linear(k1, dim_z, 2 * dim_z),
            _init_linear(k2, 2 * dim_z, 2 * dim_z),
            _init_linear(k3, 2 * dim_z, dim_z),
        ]
    }


def apply_mlp_z3(params, z, alpha, layers=None):
    al = alpha[:, :1]
    out = _mlp(params["mlp"], z)
    return z + al * out


def init_embed(key, dim_z, n_layers, attr_list, nsliders=1, n_panel=6):
    keys = jax.random.split(key, max(len(attr_list), 1))
    return {
        "w": {
            name: 0.02
            * jax.random.normal(k, (n_panel, 1, dim_z, nsliders), jnp.float32)
            for name, k in zip(attr_list, keys)
        }
    }


def apply_embed(params, z, alpha, name=None, index=0, layers=None):
    """Discrete embedding walk (transform_base.py:21-41): z += bank[index].

    name selects the per-attribute bank; None (the generic Editor.edit call
    path, e.g. --trainEmbed training) uses the first bank — the reference
    only ever trains this module single-attribute."""
    if name is None:
        bank = next(iter(params["w"].values()))
    else:
        bank = params["w"][name]
    delta = jnp.sum(bank[index, 0], axis=-1)  # [D], summed over sliders
    return z + delta[None, :]


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# kind -> (init, apply, latent_space)
REGISTRY: dict[str, tuple[Callable, Callable, str]] = {
    "linear_w": (init_linear_w, apply_linear_w, "w"),
    "mlp_w": (init_mlp_w, apply_mlp_w, "w"),
    "nn_w": (init_nn_w, apply_nn_w, "w"),
    "mlp_z": (init_mlp_z, apply_mlp_z, "z"),
    "linear_z_free": (init_linear_z_free, apply_linear_z_free, "z"),
    "linear_z": (init_linear_z, apply_linear_z, "z"),
    "linear_z_dir": (init_linear_z_dir, apply_linear_z_dir, "z"),
    "mlp_z_norm": (init_mlp_z_norm, apply_mlp_z_norm, "z"),
    "mlp_z3": (init_mlp_z3, apply_mlp_z3, "z"),
    "embed": (init_embed, apply_embed, "z"),
}


def resolve_walk_kind(model: str, walk_type: str, latent: str, train_embed: bool = False,
                      is_mlp: bool = False) -> str:
    """Map reference CLI coordinates (--model/--walk_type/--latent/--trainEmbed/
    is_mlp) to a walk kind, cell-for-cell with the reference's selection
    (transform_base.py:296-327 and pggan transform_base.py:265-276).

    is_mlp is the reference's hardcoded ``self.is_mlp = False`` toggle
    (transform_base.py:291, "TODO: Hard code") exposed as an option —
    it unlocks the mlp_w / mlp_z modules the reference defines but leaves
    unreachable. The reference raises NotImplementedError for a linear
    z-space walk without it (:305-308); reproduced."""
    if model == "pggan":
        # the pggan engine ignores trainEmbed for selection (:265-276);
        # its embed bank is reached through get_z_new_tensor's name/index
        # path, not the constructor
        if train_embed:
            return "embed"
        return "linear_z_free" if walk_type == "linear" else "mlp_z3"
    # stylegan family: NN walks ignore trainEmbed (:325-327 elif ordering)
    if "NN" in walk_type:
        return "nn_w"
    if walk_type == "linear":
        if train_embed:
            return "embed"
        if latent == "z":
            if is_mlp:
                return "mlp_z"
            raise NotImplementedError(
                "linear z-space walk without is_mlp is unimplemented in the "
                "reference (transform_base.py:305-308)"
            )
        if latent == "w":
            return "mlp_w" if is_mlp else "linear_w"
        raise NotImplementedError(f"unknown latent space {latent!r}")
    raise NotImplementedError(f"unknown walk_type {walk_type!r}")


def init_walk(key, kind, dim_z, n_layers, attr_list, nsliders=1) -> Params:
    init, _, _ = REGISTRY[kind]
    return init(key, dim_z, n_layers, attr_list, nsliders)


def apply_walk(kind, params, latent, alpha, layers=None, **kw):
    _, apply, _ = REGISTRY[kind]
    return apply(params, latent, alpha, layers=layers, **kw)


def walk_space(kind: str) -> str:
    return REGISTRY[kind][2]
