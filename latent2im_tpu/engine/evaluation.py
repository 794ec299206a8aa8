"""Quantitative evaluation: identity + attribute preservation.

Re-creates eval.py's metrics (reference eval.py:34-239 + the bucketing in
transform_base.py:675-767):

  * edits are generated per panel alpha; samples are bucketed into three
    epsilon segments by |Delta target-attribute score| <= 0.3 / 0.6 / 1.0;
  * identity preservation: 1 - mean cosine distance between face embeddings
    of original vs edited images (the reference uses facenet-VGGFace2 at
    160x160); the embedding function is pluggable — a converted facenet or,
    when no checkpoint is available, a VGG-feature embedding fallback
    (flagged in the report);
  * attribute preservation: mean |Delta| over the NON-target regressor
    outputs per bucket (eval.py:228-239).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

EPS_BUCKETS = (0.3, 0.6, 1.0)


@dataclasses.dataclass
class EvalAccumulator:
    """Per-bucket storage mirroring multi_attr/attri_org/imgs/orgs
    (transform_base.py:686-689)."""

    pred_attrs: list = dataclasses.field(default_factory=lambda: [[], [], []])
    org_attrs: list = dataclasses.field(default_factory=lambda: [[], [], []])
    edited_imgs: list = dataclasses.field(default_factory=lambda: [[], [], []])
    org_imgs: list = dataclasses.field(default_factory=lambda: [[], [], []])

    def add_batch(self, pred, org, edited, orig, target_idx: int):
        """Bucket each sample by |pred - org| at the target attribute
        (transform_base.py:718-736)."""
        delta = np.abs(pred[:, target_idx] - org[:, target_idx])
        for i in range(pred.shape[0]):
            if delta[i] <= EPS_BUCKETS[0]:
                b = 0
            elif delta[i] <= EPS_BUCKETS[1]:
                b = 1
            elif delta[i] <= EPS_BUCKETS[2]:
                b = 2
            else:
                continue
            self.pred_attrs[b].append(pred[i])
            self.org_attrs[b].append(org[i])
            self.edited_imgs[b].append(edited[i])
            self.org_imgs[b].append(orig[i])

    def counts(self):
        return [len(b) for b in self.pred_attrs]


def attribute_preservation(acc: EvalAccumulator, target_idx: int) -> list[float]:
    """Mean abs change over non-target attributes per bucket (eval.py:228-239)."""
    out = []
    for b in range(3):
        if not acc.pred_attrs[b]:
            out.append(float("nan"))
            continue
        pred = np.stack(acc.pred_attrs[b])
        org = np.stack(acc.org_attrs[b])
        diff = np.abs(pred - org)
        mask = np.ones(pred.shape[1], bool)
        mask[target_idx] = False
        out.append(float(np.mean(diff[:, mask])))
    return out


def identity_preservation(
    acc: EvalAccumulator, embed_fn: Callable, batch: int = 16
) -> list[float]:
    """1 - mean cosine distance of (orig, edited) embeddings per bucket
    (eval.py:183-208). embed_fn: uint8/float NHWC images -> [B, D]."""
    out = []
    for b in range(3):
        if not acc.edited_imgs[b]:
            out.append(float("nan"))
            continue
        edited = np.stack(acc.edited_imgs[b])
        orig = np.stack(acc.org_imgs[b])
        dists = []
        for i in range(0, len(edited), batch):
            e = embed_fn(edited[i : i + batch])
            o = embed_fn(orig[i : i + batch])
            e = np.asarray(e)
            o = np.asarray(o)
            cos = np.sum(e * o, axis=1) / (
                np.linalg.norm(e, axis=1) * np.linalg.norm(o, axis=1) + 1e-12
            )
            dists.extend(1.0 - cos)  # scipy cosine distance
        out.append(float(1.0 - np.mean(dists)))
    return out


def resize_for_embedding(
    imgs_u8: np.ndarray, size: int = 160, ref_parity: bool = False
) -> jnp.ndarray:
    """uint8 NHWC -> float resized to the facenet input size (160x160).

    Default: bilinear resize + facenet's own (x-127.5)/128 whitening — the
    arguably-correct preprocessing. ref_parity=True reproduces the reference
    eval.py's preprocessing (raw 0-255 values, PIL Image.resize with its
    default BICUBIC filter, eval.py:183-190) — bit-parity via an actual
    host-side PIL resize when PIL is importable (it always is in practice;
    jax.image 'cubic' fallback otherwise, close but not bit-identical).
    The two modes are NOT cross-comparable with each other, so the CLI
    records which one produced the report.
    """
    if ref_parity:
        x = np.asarray(imgs_u8)
        if x.ndim == 3:
            x = x[None]
        try:
            import PIL.Image

            out = np.stack([
                np.asarray(
                    PIL.Image.fromarray(im.astype(np.uint8)).resize(
                        (size, size)  # PIL default = BICUBIC, as eval.py
                    ),
                    np.float32,
                )
                for im in x
            ])
            return jnp.asarray(out)
        except ImportError:
            xj = jnp.asarray(x, jnp.float32)
            return jax.image.resize(
                xj, (xj.shape[0], size, size, xj.shape[3]), "cubic"
            )
    x = jnp.asarray(imgs_u8, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    x = jax.image.resize(x, (x.shape[0], size, size, x.shape[3]), "linear")
    return (x - 127.5) / 128.0


def make_vgg_embed_fn(vgg_params, taps=("relu_10",),
                      ref_parity: bool = False) -> Callable:
    """Fallback identity embedding from VGG16 features (used when no facenet
    checkpoint is supplied; relative comparisons remain meaningful).
    ref_parity selects the reference-style preprocessing so the report's
    provenance field stays accurate on the fallback path too."""
    from ..models import vgg as vggm

    @jax.jit
    def embed(x):
        feats = vggm.vgg_features(vgg_params, x, taps)
        f = feats[taps[0]]
        return jnp.mean(f, axis=(1, 2))

    def fn(imgs_u8):
        return embed(resize_for_embedding(imgs_u8, 160, ref_parity=ref_parity))

    return fn
