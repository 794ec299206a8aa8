"""ResNet-50 attribute regressor, TPU-native JAX (NHWC).

The reference uses torchvision resnet50 with fc replaced by Linear(2048, 40)
as a frozen attribute regressor (reference: graphs/stylegan_v2_real/
transform_base.py:522-534) and trains the same network on scene images
(scene_regressor_256.py). This implements the torchvision-v1 architecture
(Bottleneck [3,4,6,3]) as a pure function so converted torchvision
state_dicts drop in (see io/torch_convert.py), with BatchNorm supporting both
frozen inference (running stats) and training mode (batch stats + running
stat updates) for the regressor-training CLI.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

Params = dict[str, Any]

BOTTLENECK_LAYERS = (3, 4, 6, 3)  # resnet50
EXPANSION = 4


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _kaiming_conv(key, kh, kw, cin, cout):
    # torchvision: kaiming_normal_(fan_out, relu)
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def init_conv_bn(key, kh, kw, cin, cout):
    return {
        "w": _kaiming_conv(key, kh, kw, cin, cout),
        "gamma": jnp.ones((cout,), jnp.float32),
        "beta": jnp.zeros((cout,), jnp.float32),
        "mean": jnp.zeros((cout,), jnp.float32),
        "var": jnp.ones((cout,), jnp.float32),
    }


def conv2d(w, x, stride=1, padding=0):
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(p, x, train: bool = False, eps: float = 1e-5, momentum: float = 0.1):
    """Returns (out, updated_stats|None)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_stats = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var = p["mean"], p["var"]
        new_stats = None
    inv = lax.rsqrt(var + eps)
    out = (x - mean.astype(x.dtype)) * (inv * p["gamma"]).astype(x.dtype) + p[
        "beta"
    ].astype(x.dtype)
    return out, new_stats


STEM_S2D_MIN_RES = 512
# The fully-fused 4x4-block stem+BN+relu+maxpool (_stem_pool_s2d4) measured
# SLOWER end-to-end at 1024px (122 vs 129.5 img/s): its 3-tap phase kernel
# carries ~2.8x nominal FLOPs, outweighing the 12->48 input-lane win. Kept
# parity-tested for parts where the tradeoff flips; default = the 2x2-block
# stem conv + plain pool.
STEM_POOL_S2D4 = False


def _stem_conv_s2d(w, x):
    """The 7x7/stride-2 stem conv via space-to-depth: input C=3 fills 2% of
    the MXU's lanes at full res (profiled 8.7 ms at 1024px); on the 2x2
    block grid it becomes a 4x4 conv over 12 channels at half resolution.

    out[m] = sum_d K[d] x[2m+d-3]: block j = m + db - 2, db in [0,4),
    tap d = 2*db + r - 1 (r = pixel parity), pad (2,1) on the block grid.
    """
    b, h, wd, c = x.shape
    x2 = (
        x.reshape(b, h // 2, 2, wd // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, wd // 2, 4 * c)
    )
    cin, cout = w.shape[2], w.shape[3]
    k4 = jnp.zeros((4, 4, 2, 2, cin, cout), w.dtype)
    for dby in range(4):
        for ry in range(2):
            dy = 2 * dby + ry - 1
            if not 0 <= dy <= 6:
                continue
            for dbx in range(4):
                for rx in range(2):
                    dx = 2 * dbx + rx - 1
                    if not 0 <= dx <= 6:
                        continue
                    k4 = k4.at[dby, dbx, ry, rx].set(w[dy, dx])
    k4 = k4.reshape(4, 4, 4 * cin, cout)
    return lax.conv_general_dilated(
        x2,
        k4.astype(x2.dtype),
        (1, 1),
        ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _stem_pool_s2d4(stem_p, x, train=False):
    """Fused stem conv (7x7/2) + BN + relu + maxpool (3x3/2), entirely on a
    4x4 space-to-depth grid — the full-res [H/2, W/2, 64] intermediate never
    materializes (profiled: the plain stem conv alone was 5.9 ms at 1024px,
    input C=3 starving the MXU lanes; here the conv runs 48-in/256-out).

    Derivation (1-D): input o = 4b + r (blocks b on the quarter grid, phase
    r in [0,4)); stem output m = 2p + s on the half grid: stem[m] =
    sum_d K[d] x[2m+d-3] gives tap d = 4(b-p) + r - 2s + 3, b-p in
    {-1,0,1} — a 3-tap conv over the quarter grid emitting 2 phases (s) per
    axis as channels. maxpool out[n] = max(stem[2n-1], stem[2n], stem[2n+1])
    = max(s1[n-1], s0[n], s1[n]) — shifted maxes on the phase channels, so
    the pooled result lands directly on the quarter grid in normal form.

    Returns (pooled [B, H/4, W/4, 64], bn_stats|None).
    """
    b, h, wd, c = x.shape
    x4 = (
        x.reshape(b, h // 4, 4, wd // 4, 4, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 4, wd // 4, 16 * c)
    )
    w = stem_p["w"]
    cin, cout = w.shape[2], w.shape[3]
    wz = jnp.concatenate([w, jnp.zeros((1, 7, cin, cout), w.dtype)], axis=0)
    wz = jnp.concatenate([wz, jnp.zeros((8, 1, cin, cout), wz.dtype)], axis=1)

    def axis_idx():
        """[3(idx), 4(r), 2(s)] -> tap d (7 = zero plane)."""
        import numpy as np

        out = np.full((3, 4, 2), 7, np.int32)
        for idx in range(3):
            for r in range(4):
                for s in range(2):
                    d = 4 * (idx - 1) + r - 2 * s + 3
                    if 0 <= d <= 6:
                        out[idx, r, s] = d
        return out

    import numpy as np

    ai = axis_idx()
    iy = ai[:, None, :, None, :, None]
    ix = ai[None, :, None, :, None, :]
    iy, ix = np.broadcast_arrays(iy, ix)  # [3,3,4,4,2,2] (idxy,idxx,ry,rx,sy,sx)
    k = wz[jnp.asarray(iy), jnp.asarray(ix)]  # [3,3,4,4,2,2,cin,cout]
    # -> [idx_y, idx_x, (ry, rx, ci), (sy, sx, co)]
    k = k.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(3, 3, 16 * cin, 4 * cout)

    out4 = lax.conv_general_dilated(
        x4, k.astype(x4.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, H/4, W/4, (sy, sx, co)]

    # BN (+stats over all phase positions) and relu in the phase domain
    if train:
        ph = out4.reshape(b, h // 4, wd // 4, 4, cout)
        mean = jnp.mean(ph, axis=(0, 1, 2, 3))
        var = jnp.var(ph, axis=(0, 1, 2, 3))
        n = b * (h // 4) * (wd // 4) * 4
        stats = {
            "mean": (1 - 0.1) * stem_p["mean"] + 0.1 * mean,
            "var": (1 - 0.1) * stem_p["var"] + 0.1 * var * n / max(n - 1, 1),
        }
        inv = lax.rsqrt(var + 1e-5)
        mu = mean
    else:
        stats = None
        inv = lax.rsqrt(stem_p["var"] + 1e-5)
        mu = stem_p["mean"]
    scale = jnp.tile(inv * stem_p["gamma"], 4).astype(out4.dtype)
    shift = jnp.tile(stem_p["beta"] - mu * inv * stem_p["gamma"], 4).astype(
        out4.dtype
    )
    out4 = jax.nn.relu(out4 * scale + shift)

    # maxpool 3x3/2 as shifted maxes over the phase channels (separable)
    neg = jnp.asarray(-jnp.inf, out4.dtype)

    def pool_axis(a, axis, phase_axis):
        s0 = lax.index_in_dim(a, 0, axis=phase_axis, keepdims=False)
        s1 = lax.index_in_dim(a, 1, axis=phase_axis, keepdims=False)
        pad = [(0, 0)] * s1.ndim
        pad[axis] = (1, 0)
        sl = [slice(None)] * s1.ndim
        sl[axis] = slice(0, s1.shape[axis])
        s1_prev = jnp.pad(s1, pad, constant_values=neg)[tuple(sl)]
        return jnp.maximum(jnp.maximum(s1_prev, s0), s1)

    ph = out4.reshape(b, h // 4, wd // 4, 2, 2, cout)
    t = pool_axis(ph, axis=1, phase_axis=3)   # [B, H/4, W/4, 2(sx), cout]
    return pool_axis(t, axis=2, phase_axis=3), stats


def max_pool(x, window=3, stride=2, padding=1):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


# ---------------------------------------------------------------------------
# bottleneck blocks
# ---------------------------------------------------------------------------


def block_stride(layer_idx: int, block_idx: int) -> int:
    """Stride is structural (first block of layers 2-4 downsamples); keeping
    it out of the param tree keeps every leaf differentiable."""
    return (1 if layer_idx == 0 else 2) if block_idx == 0 else 1


def init_bottleneck(key, cin, planes, stride, downsample: bool):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": init_conv_bn(k1, 1, 1, cin, planes),
        "conv2": init_conv_bn(k2, 3, 3, planes, planes),
        "conv3": init_conv_bn(k3, 1, 1, planes, planes * EXPANSION),
    }
    if downsample:
        p["down"] = init_conv_bn(k4, 1, 1, cin, planes * EXPANSION)
    return p


def bottleneck(p, x, stride, train=False):
    stats = {}
    out = conv2d(p["conv1"]["w"], x)
    out, s = batch_norm(p["conv1"], out, train)
    stats["conv1"] = s
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"]["w"], out, stride=stride, padding=1)
    out, s = batch_norm(p["conv2"], out, train)
    stats["conv2"] = s
    out = jax.nn.relu(out)
    out = conv2d(p["conv3"]["w"], out)
    out, s = batch_norm(p["conv3"], out, train)
    stats["conv3"] = s
    if "down" in p:
        idn = conv2d(p["down"]["w"], x, stride=stride)
        idn, s = batch_norm(p["down"], idn, train)
        stats["down"] = s
    else:
        idn = x
    return jax.nn.relu(out + idn), stats


# ---------------------------------------------------------------------------
# resnet-50
# ---------------------------------------------------------------------------


def init_resnet50(key, num_outputs: int = 40) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    params: Params = {"stem": init_conv_bn(next(ki), 7, 7, 3, 64), "layers": []}
    cin = 64
    planes = 64
    for li, n_blocks in enumerate(BOTTLENECK_LAYERS):
        stride = 1 if li == 0 else 2
        blocks = []
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            need_down = bi == 0 and (s != 1 or cin != planes * EXPANSION)
            blocks.append(init_bottleneck(next(ki), cin, planes, s, need_down))
            cin = planes * EXPANSION
        params["layers"].append(blocks)
        planes *= 2
    kfc = next(ki)
    bound = 1.0 / math.sqrt(2048)
    params["fc"] = {
        "w": jax.random.uniform(kfc, (2048, num_outputs), jnp.float32, -bound, bound),
        "b": jnp.zeros((num_outputs,), jnp.float32),
    }
    return params


def resnet50_forward(params: Params, x, train: bool = False, dtype=jnp.float32):
    """x: [B,H,W,3] -> [B, num_outputs]. Returns (logits, bn_stats|None)."""
    x = x.astype(dtype)
    big = x.shape[1] >= STEM_S2D_MIN_RES
    if STEM_POOL_S2D4 and big and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        out, stem_stats = _stem_pool_s2d4(params["stem"], x, train)
    else:
        if big and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            out = _stem_conv_s2d(params["stem"]["w"], x)
        else:
            out = conv2d(params["stem"]["w"], x, stride=2, padding=3)
        out, stem_stats = batch_norm(params["stem"], out, train)
        out = jax.nn.relu(out)
        out = max_pool(out)
    all_stats = {"stem": stem_stats, "layers": []}
    for li, blocks in enumerate(params["layers"]):
        layer_stats = []
        for bi, blk in enumerate(blocks):
            out, s = bottleneck(blk, out, block_stride(li, bi), train)
            layer_stats.append(s)
        all_stats["layers"].append(layer_stats)
    out = jnp.mean(out, axis=(1, 2))  # global average pool
    logits = out @ params["fc"]["w"].astype(out.dtype) + params["fc"]["b"].astype(
        out.dtype
    )
    return logits.astype(jnp.float32), (all_stats if train else None)


def apply_bn_stats(params: Params, stats) -> Params:
    """Fold train-mode BN stat updates into a NEW param tree (pure, jit-safe)."""

    def upd(p, s):
        if s is None:
            return p
        out = dict(p)
        out["mean"], out["var"] = s["mean"], s["var"]
        return out

    new = dict(params)
    new["stem"] = upd(params["stem"], stats["stem"])
    new_layers = []
    for blocks, lstats in zip(params["layers"], stats["layers"]):
        nb = []
        for blk, bstats in zip(blocks, lstats):
            b2 = dict(blk)
            for name in ("conv1", "conv2", "conv3", "down"):
                if name in blk and bstats.get(name) is not None:
                    b2[name] = upd(blk[name], bstats[name])
            nb.append(b2)
        new_layers.append(nb)
    new["layers"] = new_layers
    return new
