"""Walk-training losses, composed exactly as the reference weighs them.

total = 10 * reg_BCE + 0.05 * VGG_content + 0.05 * GAN_BCE
(reference: graphs/stylegan_v2_real/transform_base.py:456-490), with
--no_content_loss / --no_gan_loss ablations (when both are dropped the reg
term is unweighted, matching transform_base.py:475-478).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import vgg as vggm

REG_WEIGHT = 10.0
CONTENT_WEIGHT = 0.05
GAN_WEIGHT = 0.05


def raw_bce(pred, target, eps: float = 1e-12):
    """The reference's handwritten BCE on *raw* (unbounded) regressor outputs
    (transform_base.py:412-414): clamps pred and 1-pred at eps before log.
    NaN-prone by construction when pred > 1; reproduced for parity. (The
    reference also casts targets to double — f64 is unavailable on TPU, so
    the f32 difference is accepted and covered by the formula test's rtol.)"""
    t1 = target * jnp.log(jnp.clip(pred, min=eps))
    t2 = (1.0 - target) * jnp.log(jnp.clip(1.0 - pred, min=eps))
    return -jnp.mean(t1 + t2)


def stable_bce(pred, target):
    """Numerically-stable sigmoid BCE alternative (opt-in via --stable_bce)."""
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    )


def reg_loss(pred, target, stable: bool = False):
    return stable_bce(pred, target) if stable else raw_bce(pred, target)


def gan_loss_from_logits(d_logits):
    """BCEWithLogits(D(edited), 1) = softplus(-logit) (transform_base.py:460-463)."""
    return jnp.mean(jax.nn.softplus(-d_logits))


def content_loss(vgg_params, org_img, edited_img, taps=vggm.CONTENT_TAPS,
                 dtype=jnp.float32):
    """Mean of per-tap MSEs at VGG conv_1..conv_4 (transform_base.py:426-454).

    NOTE: the reference normalizes the [-1,1] generator output with ImageNet
    mean/std directly (no [0,1] rescale); reproduced exactly. dtype runs the
    VGG tower in reduced precision (bf16 taps; the MSE reduction stays f32).
    """
    org = vggm.imagenet_normalize(jax.lax.stop_gradient(org_img))
    edi = vggm.imagenet_normalize(edited_img)
    f_org = vggm.vgg_features(vgg_params, org, taps, dtype=dtype)
    f_edi = vggm.vgg_features(vgg_params, edi, taps, dtype=dtype)
    losses = [
        jnp.mean(
            jnp.square(
                jax.lax.stop_gradient(f_org[t]).astype(jnp.float32)
                - f_edi[t].astype(jnp.float32)
            )
        )
        for t in taps
    ]
    return sum(losses) / len(losses)


def masked_l2(logit, target, mask):
    """Pixel-space edit loss for geometric transforms (transform_base.py:388-394)."""
    diff = (logit - target) * mask
    return jnp.sum(diff * diff) / jnp.sum(mask)


def gram_perceptual(vgg16_params, img_a, img_b, taps=vggm.VGG16_GRAM_TAPS):
    """BP.py's VGG16 gram-matrix loss (BP.py:173-184)."""
    fa = vggm.vgg_features(vgg16_params, img_a, taps)
    fb = vggm.vgg_features(vgg16_params, img_b, taps)
    loss = 0.0
    for t in taps:
        ga = vggm.gram_matrix(fa[t])
        gb = vggm.gram_matrix(fb[t])
        loss = loss + jnp.mean((ga - gb) ** 2)
    return loss


def combine(reg, content, gan, no_content_loss=False, no_gan_loss=False,
            pggan_gating=False):
    """Weighted combination with the reference's ablation gating.

    stylegan gates the 10x only when BOTH ablations are on
    (transform_base.py:475-486); pggan gates when EITHER is on
    (pggan transform_base.py:496-504). `pggan_gating` selects the latter.
    """
    bare = (no_content_loss or no_gan_loss) if pggan_gating else (
        no_content_loss and no_gan_loss
    )
    loss = reg if bare else REG_WEIGHT * reg
    if not no_content_loss:
        loss = loss + CONTENT_WEIGHT * content
    if not no_gan_loss:
        loss = loss + GAN_WEIGHT * gan
    return loss
