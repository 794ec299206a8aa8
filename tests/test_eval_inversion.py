"""Eval machinery + inversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.engine import evaluation as ev
from latent2im_tpu.engine.inversion import invert, nll_pixel_loss
from latent2im_tpu.models import stylegan2 as sg2
from latent2im_tpu.models import vgg as vggm

TINY_CHANNELS = {4: 16, 8: 16, 16: 8, 32: 8}


def test_bucketing():
    acc = ev.EvalAccumulator()
    pred = np.array([[0.1, 0.5], [0.9, 0.5], [2.5, 0.5], [0.45, 0.5]])
    org = np.zeros((4, 2))
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    acc.add_batch(pred, org, imgs, imgs, target_idx=0)
    # deltas at attr 0: 0.1 -> b0, 0.9 -> b2, 2.5 -> dropped, 0.45 -> b1
    assert acc.counts() == [1, 1, 1]


def test_attribute_preservation_excludes_target():
    acc = ev.EvalAccumulator()
    pred = np.array([[0.2, 0.7, 0.3]])
    org = np.array([[0.0, 0.2, 0.1]])
    imgs = np.zeros((1, 4, 4, 3), np.uint8)
    acc.add_batch(pred, org, imgs, imgs, target_idx=0)
    vals = ev.attribute_preservation(acc, target_idx=0)
    np.testing.assert_allclose(vals[0], np.mean([0.5, 0.2]), rtol=1e-6)
    assert np.isnan(vals[1]) and np.isnan(vals[2])


def test_identity_preservation_identical_images():
    acc = ev.EvalAccumulator()
    img = np.random.RandomState(0).randint(0, 255, (2, 16, 16, 3), np.uint8)
    pred = np.zeros((2, 3))
    pred[:, 0] = 0.1
    acc.add_batch(pred, np.zeros((2, 3)), img, img, target_idx=0)

    def embed(x):
        return np.mean(np.asarray(x, np.float32), axis=(1, 2))

    vals = ev.identity_preservation(acc, embed)
    np.testing.assert_allclose(vals[0], 1.0, atol=1e-5)


def test_facenet_shapes_and_converter():
    from latent2im_tpu.models import facenet as fnm

    params = fnm.init_facenet(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 160, 160, 3)) * 0.1
    emb = fnm.facenet_forward(params, x)
    assert emb.shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=1), 1.0, rtol=1e-5
    )


def test_facenet_converter_synthetic_roundtrip():
    torch = pytest.importorskip("torch")
    from latent2im_tpu.io import torch_convert as tc
    from latent2im_tpu.models import facenet as fnm

    # build a synthetic facenet_pytorch-layout state_dict
    sd = {}

    def add_basic(prefix, cin, cout, kh, kw):
        sd[f"{prefix}.conv.weight"] = torch.randn(cout, cin, kh, kw) * 0.05
        sd[f"{prefix}.bn.weight"] = torch.ones(cout)
        sd[f"{prefix}.bn.bias"] = torch.zeros(cout)
        sd[f"{prefix}.bn.running_mean"] = torch.zeros(cout)
        sd[f"{prefix}.bn.running_var"] = torch.ones(cout)

    def add_conv(prefix, cin, cout):
        sd[f"{prefix}.weight"] = torch.randn(cout, cin, 1, 1) * 0.05
        sd[f"{prefix}.bias"] = torch.zeros(cout)

    add_basic("conv2d_1a", 3, 32, 3, 3)
    add_basic("conv2d_2a", 32, 32, 3, 3)
    add_basic("conv2d_2b", 32, 64, 3, 3)
    add_basic("conv2d_3b", 64, 80, 1, 1)
    add_basic("conv2d_4a", 80, 192, 3, 3)
    add_basic("conv2d_4b", 192, 256, 3, 3)
    for i in range(5):
        add_basic(f"repeat_1.{i}.branch0", 256, 32, 1, 1)
        add_basic(f"repeat_1.{i}.branch1.0", 256, 32, 1, 1)
        add_basic(f"repeat_1.{i}.branch1.1", 32, 32, 3, 3)
        for j, (ci, co, k) in enumerate([(256, 32, 1), (32, 32, 3), (32, 32, 3)]):
            add_basic(f"repeat_1.{i}.branch2.{j}", ci, co, k, k)
        add_conv(f"repeat_1.{i}.conv2d", 96, 256)
    add_basic("mixed_6a.branch0", 256, 384, 3, 3)
    for j, (ci, co, k) in enumerate([(256, 192, 1), (192, 192, 3), (192, 256, 3)]):
        add_basic(f"mixed_6a.branch1.{j}", ci, co, k, k)
    for i in range(10):
        add_basic(f"repeat_2.{i}.branch0", 896, 128, 1, 1)
        add_basic(f"repeat_2.{i}.branch1.0", 896, 128, 1, 1)
        sd[f"repeat_2.{i}.branch1.1.conv.weight"] = torch.randn(128, 128, 1, 7) * 0.05
        for suff in ("weight", "bias", "running_mean", "running_var"):
            key = {"weight": torch.ones, "bias": torch.zeros,
                   "running_mean": torch.zeros, "running_var": torch.ones}[suff]
            sd[f"repeat_2.{i}.branch1.1.bn.{suff}"] = key(128)
        sd[f"repeat_2.{i}.branch1.2.conv.weight"] = torch.randn(128, 128, 7, 1) * 0.05
        for suff in ("weight", "bias", "running_mean", "running_var"):
            key = {"weight": torch.ones, "bias": torch.zeros,
                   "running_mean": torch.zeros, "running_var": torch.ones}[suff]
            sd[f"repeat_2.{i}.branch1.2.bn.{suff}"] = key(128)
        add_conv(f"repeat_2.{i}.conv2d", 256, 896)
    for k_, dims in (("branch0", [(896, 256, 1), (256, 384, 3)]),
                     ("branch1", [(896, 256, 1), (256, 256, 3)]),
                     ("branch2", [(896, 256, 1), (256, 256, 3), (256, 256, 3)])):
        for j, (ci, co, k) in enumerate(dims):
            add_basic(f"mixed_7a.{k_}.{j}", ci, co, k, k)
    for i in range(5):
        add_basic(f"repeat_3.{i}.branch0", 1792, 192, 1, 1)
        add_basic(f"repeat_3.{i}.branch1.0", 1792, 192, 1, 1)
        sd[f"repeat_3.{i}.branch1.1.conv.weight"] = torch.randn(192, 192, 1, 3) * 0.05
        sd[f"repeat_3.{i}.branch1.2.conv.weight"] = torch.randn(192, 192, 3, 1) * 0.05
        for j in (1, 2):
            for suff, fn in (("weight", torch.ones), ("bias", torch.zeros),
                             ("running_mean", torch.zeros), ("running_var", torch.ones)):
                sd[f"repeat_3.{i}.branch1.{j}.bn.{suff}"] = fn(192)
        add_conv(f"repeat_3.{i}.conv2d", 384, 1792)
    add_basic("block8.branch0", 1792, 192, 1, 1)
    add_basic("block8.branch1.0", 1792, 192, 1, 1)
    sd["block8.branch1.1.conv.weight"] = torch.randn(192, 192, 1, 3) * 0.05
    sd["block8.branch1.2.conv.weight"] = torch.randn(192, 192, 3, 1) * 0.05
    for j in (1, 2):
        for suff, fn in (("weight", torch.ones), ("bias", torch.zeros),
                         ("running_mean", torch.zeros), ("running_var", torch.ones)):
            sd[f"block8.branch1.{j}.bn.{suff}"] = fn(192)
    add_conv("block8.conv2d", 384, 1792)
    sd["last_linear.weight"] = torch.randn(512, 1792) * 0.02
    sd["last_bn.weight"] = torch.ones(512)
    sd["last_bn.bias"] = torch.zeros(512)
    sd["last_bn.running_mean"] = torch.zeros(512)
    sd["last_bn.running_var"] = torch.ones(512)

    params = tc.convert_facenet(sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 160, 160, 3)) * 0.05
    emb = fnm.facenet_forward(params, x)
    assert emb.shape == (1, 512)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_inversion_reduces_loss():
    """Inverting an image the generator itself produced must drive loss down."""
    key = jax.random.PRNGKey(0)
    g = sg2.init_generator(key, 32, style_dim=32, n_mlp=2, channels=TINY_CHANNELS)
    vgg16 = vggm.init_vgg(jax.random.PRNGKey(1), "vgg16")
    nl = sg2.n_latent(32)
    # target image from a known latent
    w_true = sg2.style_forward(g, jax.random.normal(jax.random.PRNGKey(2), (1, 32)))
    target = sg2.synthesize(g, jnp.repeat(w_true[:, None, :], nl, axis=1))

    losses = []
    w, out, _ = invert(
        g, vgg16, target, nl, n_loops=30, lr=5e-2, show_freq=10,
        on_loop=lambda loop, lv, o: losses.append(lv),
    )
    assert losses[-1] < losses[0], f"inversion loss did not drop: {losses}"


def test_nll_pixel_loss():
    a = jnp.zeros((1, 4, 4, 3))
    b = jnp.ones((1, 4, 4, 3))
    np.testing.assert_allclose(float(nll_pixel_loss(b, a)[0]), 1.0, rtol=1e-6)


def test_ref_parity_resize_bit_matches_pil():
    """--ref_parity preprocessing must bit-match the reference eval.py's
    PIL Image.resize((160,160)) on raw uint8 (eval.py:183-190)."""
    import PIL.Image

    from latent2im_tpu.engine.evaluation import resize_for_embedding

    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (3, 47, 53, 3), np.uint8)
    got = np.asarray(resize_for_embedding(imgs, 160, ref_parity=True))
    want = np.stack([
        np.asarray(PIL.Image.fromarray(im).resize((160, 160)), np.float32)
        for im in imgs
    ])
    np.testing.assert_array_equal(got, want)
