"""PGGAN model + converter + engine-path tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.models import pggan as pgg

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


def test_generator_resolution_ladder():
    key = jax.random.PRNGKey(0)
    params = pgg.init_generator(key, n_label=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    for step in (0, 1, 2):
        img = pgg.generator_forward(params, z, step=step, alpha=1.0)
        res = pgg.step_to_resolution(step)
        assert img.shape == (2, res, res, 3)
        assert np.all(np.isfinite(np.asarray(img)))


def test_generator_fade_in_blend():
    key = jax.random.PRNGKey(0)
    params = pgg.init_generator(key, n_label=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    full = pgg.generator_forward(params, z, step=2, alpha=1.0)
    faded = pgg.generator_forward(params, z, step=2, alpha=0.5)
    prev = pgg.generator_forward(params, z, step=2, alpha=0.0)
    # alpha=0 must equal the upsampled previous-res rgb path, not the full one
    assert not np.allclose(np.asarray(full), np.asarray(prev))
    mid = 0.5 * np.asarray(prev) + 0.5 * np.asarray(full)
    np.testing.assert_allclose(np.asarray(faded), mid, rtol=1e-4, atol=1e-4)


def test_discriminator_shapes():
    key = jax.random.PRNGKey(0)
    params = pgg.init_discriminator(key)
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
    score, labels = pgg.discriminator_forward(params, img, step=2, alpha=1.0)
    assert score.shape == (4,)
    assert labels.shape == (4, 10)


def _torch_pggan_oracle():
    """Inline torch oracle with model_256.py-compatible state_dict keys for
    the first 3 G blocks (enough to run step<=2)."""

    class EqualConv2d(nn.Module):
        def __init__(self, cin, cout, k, padding):
            super().__init__()
            conv = nn.Conv2d(cin, cout, k, padding=padding)
            conv.weight.data.normal_()
            conv.bias.data.zero_()
            # equal_lr: move weight -> weight_orig, scale at forward
            self.conv = conv
            w = conv.weight.data
            del conv._parameters["weight"]
            conv.register_parameter("weight_orig", nn.Parameter(w))

        def forward(self, x):
            w = self.conv.weight_orig
            fan_in = w.size(1) * w[0][0].numel()
            import math

            weight = w * math.sqrt(2 / fan_in)
            return torch.nn.functional.conv2d(
                x, weight, self.conv.bias, padding=self.conv.padding
            )

    class PixelNorm(nn.Module):
        def forward(self, x):
            return x / torch.sqrt(torch.mean(x**2, dim=1, keepdim=True) + 1e-8)

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout, k1, p1, k2=None, p2=None):
            super().__init__()
            k2 = k2 or k1
            p2 = p1 if p2 is None else p2
            self.conv = nn.Sequential(
                EqualConv2d(cin, cout, k1, p1),
                PixelNorm(),
                nn.LeakyReLU(0.2),
                EqualConv2d(cout, cout, k2, p2),
                PixelNorm(),
                nn.LeakyReLU(0.2),
            )

        def forward(self, x):
            return self.conv(x)

    class G(nn.Module):
        def __init__(self):
            super().__init__()
            self.label_embed = nn.Embedding(10, 10)
            self.label_embed.weight.data.normal_()
            self.progression = nn.ModuleList(
                [ConvBlock(512, 512, 4, 3, 3, 1), ConvBlock(512, 512, 3, 1),
                 ConvBlock(512, 512, 3, 1)]
            )
            self.to_rgb = nn.ModuleList(
                [nn.Conv2d(512, 3, 1), nn.Conv2d(512, 3, 1), nn.Conv2d(512, 3, 1)]
            )

        def forward(self, z, step=2):
            x = z / torch.sqrt(torch.mean(z**2, dim=1, keepdim=True) + 1e-8)
            label = self.label_embed(torch.zeros(z.size(0), dtype=torch.int64))
            out = torch.cat([x, label], 1).unsqueeze(2).unsqueeze(3)
            up = None
            for i, (conv, to_rgb) in enumerate(zip(self.progression, self.to_rgb)):
                if i > 0 and step > 0:
                    up = torch.nn.functional.interpolate(out, scale_factor=2)
                    out = conv(up)
                else:
                    out = conv(out)
                if i == step:
                    out = to_rgb(out)
                    break
            return out

    return G()


def test_pggan_generator_matches_torch_oracle():
    tm = _torch_pggan_oracle().eval()
    from latent2im_tpu.io import torch_convert as tc

    sd = tm.state_dict()
    # converter expects the full 9-block ladder; patch a partial tree by hand
    params = {
        "label_embed": sd["label_embed.weight"].numpy(),
        "progression": [],
        "to_rgb": [],
    }
    for i in range(3):
        pre = f"progression.{i}.conv"
        params["progression"].append(
            {
                "conv1": {
                    "w": np.transpose(sd[f"{pre}.0.conv.weight_orig"].numpy(), (2, 3, 1, 0)),
                    "b": sd[f"{pre}.0.conv.bias"].numpy(),
                },
                "conv2": {
                    "w": np.transpose(sd[f"{pre}.3.conv.weight_orig"].numpy(), (2, 3, 1, 0)),
                    "b": sd[f"{pre}.3.conv.bias"].numpy(),
                },
            }
        )
        params["to_rgb"].append(
            {
                "w": np.transpose(sd[f"to_rgb.{i}.weight"].numpy(), (2, 3, 1, 0)),
                "b": sd[f"to_rgb.{i}.bias"].numpy(),
            }
        )

    z = np.random.RandomState(0).randn(2, 502).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z), step=2).numpy()
    # the torch oracle models the unblended (alpha outside [0,1)) branch
    got = pgg.generator_forward(params, jnp.asarray(z), step=2, alpha=1.0)
    from helpers import assert_close

    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                 rtol=2e-3, atol=2e-3)


def test_pggan_editor_train_step():
    """One z-space walk train step through the pggan engine path (tiny step)."""
    import argparse

    from latent2im_tpu.config.options import TrainOptions
    from latent2im_tpu.engine.train import make_optimizer, make_train_step
    from latent2im_tpu.tasks.transforms import get_task

    opt = TrainOptions().parse(
        [
            "--model", "pggan", "--transform", "scene", "--walk_type", "linear",
            "--resolution", "16", "--attrList", "daylight,night",
            "--models_dir", "/tmp/pgg_test", "--overwrite_config",
            "--no_content_loss",
        ],
        print_opt=False,
    )
    from latent2im_tpu.engine.build import build_editor_from_options

    editor, walk, info = build_editor_from_options(opt)
    assert editor.cfg.latent == "z"
    assert editor.cfg.walk_kind == "linear_z_free"
    task = get_task("scene")
    optx = make_optimizer(1e-3)
    state = optx.init(walk)
    step = make_train_step(editor, task, optx)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 512), jnp.float32)
    w0 = np.asarray(walk["w"]).copy()
    walk, state, metrics = step(walk, state, z, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(walk["w"]), w0)


def test_discriminator_std_channel_unbiased():
    """The batch-std channel uses torch's UNBIASED std (input.std(0),
    model_256.py:335)."""
    key = jax.random.PRNGKey(0)
    params = pgg.init_discriminator(key)
    img = np.random.RandomState(0).randn(4, 4, 4, 3).astype(np.float32)
    want_stat = float(torch.from_numpy(img).std(0).mean())  # ddof=1
    got_stat = float(jnp.mean(jnp.std(jnp.asarray(img), axis=0, ddof=1)))
    np.testing.assert_allclose(got_stat, want_stat, rtol=1e-5)
    # and the forward still runs with the std channel in place
    score, _ = pgg.discriminator_forward(params, jnp.asarray(img), step=0)
    assert np.isfinite(np.asarray(score)).all()


def test_generator_default_alpha_matches_reference_call_sites():
    """netG(z) in the reference uses model_256.py's defaults (step=6,
    alpha=0), whose blend outputs the PREVIOUS resolution's rgb head —
    the default here must reproduce that."""
    key = jax.random.PRNGKey(0)
    params = pgg.init_generator(key, n_label=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 512))
    default = pgg.generator_forward(params, z, step=2)
    prev = pgg.generator_forward(params, z, step=2, alpha=0.0)
    np.testing.assert_allclose(np.asarray(default), np.asarray(prev))
