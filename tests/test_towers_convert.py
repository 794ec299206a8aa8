"""Aux-tower architecture + converter parity vs a torch-CPU oracle.

torchvision isn't in this image and pretrained weights can't be downloaded
(zero egress), so the tests build torch oracles inline — plain nn.Conv2d /
BatchNorm2d / Linear stacks arranged as torchvision's resnet50 / vgg
``features``, emitting torchvision-compatible state_dict keys. Converting a
randomly-initialized oracle and matching its forward output validates both
the JAX architecture and the weight converter end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from latent2im_tpu.io import torch_convert as tc  # noqa: E402
from latent2im_tpu.models import resnet as rn  # noqa: E402
from latent2im_tpu.models import vgg as vggm  # noqa: E402


# ---------------------------------------------------------------------------
# torch oracles (torchvision-compatible key layout)
# ---------------------------------------------------------------------------


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchResNet50(nn.Module):
    def __init__(self, num_outputs=40):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            layers = []
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                down = None
                if bi == 0 and (s != 1 or cin != planes * 4):
                    down = nn.Sequential(
                        nn.Conv2d(cin, planes * 4, 1, stride=s, bias=False),
                        nn.BatchNorm2d(planes * 4),
                    )
                layers.append(TorchBottleneck(cin, planes, s, down))
                cin = planes * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*layers))
        self.fc = nn.Linear(2048, num_outputs)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def torch_vgg_features(cfg):
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            cin = v
    return nn.Sequential(*layers)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_resnet50_matches_torch_oracle():
    tm = TorchResNet50(num_outputs=40).eval()
    params = tc.convert_resnet50(tm.state_dict())

    x = np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got, _ = rn.resnet50_forward(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("cfg", ["vgg16", "vgg19"])
def test_vgg_matches_torch_oracle(cfg):
    tm = torch_vgg_features(vggm.CFGS[cfg]).eval()
    params = tc.convert_vgg_features(tm.state_dict(), cfg)

    x = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    # tap conv_4 (4th conv layer) like the walk-training content loss does
    with torch.no_grad():
        h = xt
        conv_count = 0
        for layer in tm:
            h = layer(h)
            if isinstance(layer, nn.Conv2d):
                conv_count += 1
                if conv_count == 4:
                    break
        want = h.numpy()

    got = vggm.vgg_features(params, jnp.asarray(x), taps=("conv_4",))["conv_4"]
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=2e-3, atol=2e-3
    )


def test_vgg16_gram_taps_match_torch_slices():
    """relu_2/4/7/10 == vgg16 Sequential slices at 4/9/16/23 — the taps the
    reference's BP.py gram loss uses (perceptual_vgg/vgg.py:14-21)."""
    tm = torch_vgg_features(vggm.CFGS["vgg16"]).eval()
    params = tc.convert_vgg_features(tm.state_dict(), "vgg16")
    x = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))

    slices = {"relu_2": 4, "relu_4": 9, "relu_7": 16, "relu_10": 23}
    got = vggm.vgg_features(params, jnp.asarray(x), taps=tuple(slices))
    with torch.no_grad():
        h = xt
        outs = {}
        for i, layer in enumerate(tm):
            h = layer(h)
            for name, idx in slices.items():
                if i + 1 == idx:
                    outs[name] = h.numpy()
    from helpers import assert_close

    for name in slices:
        assert_close(np.transpose(np.asarray(got[name]), (0, 3, 1, 2)),
                     outs[name], rtol=2e-3, atol=2e-3)


def test_resnet_train_mode_bn_updates():
    key = jax.random.PRNGKey(0)
    params = rn.init_resnet50(key, num_outputs=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    out, stats = rn.resnet50_forward(params, x, train=True)
    assert out.shape == (4, 4)
    assert stats is not None
    p2 = rn.apply_bn_stats(params, stats)
    assert not np.allclose(
        np.asarray(p2["stem"]["mean"]), np.asarray(params["stem"]["mean"])
    )


def test_stylegan2_converter_roundtrip_shapes():
    """Build a synthetic rosinality-layout state_dict and convert; the
    converted tree must run through the generator."""
    from latent2im_tpu.models import stylegan2 as sg2

    size, n_mlp, style_dim = 32, 2, 64
    rng = np.random.RandomState(0)

    sd = {}
    for i in range(n_mlp):
        sd[f"style.{i + 1}.weight"] = torch.from_numpy(
            rng.randn(style_dim, style_dim).astype(np.float32)
        )
        sd[f"style.{i + 1}.bias"] = torch.zeros(style_dim)
    sd["input.input"] = torch.from_numpy(rng.randn(1, 32, 4, 4).astype(np.float32))

    def add_styled(prefix, cin, cout, k=3):
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
            rng.randn(1, cout, cin, k, k).astype(np.float32)
        )
        sd[f"{prefix}.conv.modulation.weight"] = torch.from_numpy(
            rng.randn(cin, style_dim).astype(np.float32)
        )
        sd[f"{prefix}.conv.modulation.bias"] = torch.ones(cin)
        sd[f"{prefix}.noise.weight"] = torch.zeros(1)
        sd[f"{prefix}.activate.bias"] = torch.zeros(cout)

    def add_torgb(prefix, cin):
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
            rng.randn(1, 3, cin, 1, 1).astype(np.float32)
        )
        sd[f"{prefix}.conv.modulation.weight"] = torch.from_numpy(
            rng.randn(cin, style_dim).astype(np.float32)
        )
        sd[f"{prefix}.conv.modulation.bias"] = torch.ones(cin)
        sd[f"{prefix}.bias"] = torch.zeros(1, 3, 1, 1)

    add_styled("conv1", 32, 32)
    add_torgb("to_rgb1", 32)
    # size 32 => 3 up-blocks: 8, 16, 32 with channels 16, 16, 8
    for i, (ci, co) in enumerate(
        [(32, 16), (16, 16), (16, 16), (16, 16), (16, 8), (8, 8)]
    ):
        add_styled(f"convs.{i}", ci, co)
    for i, co in enumerate([16, 16, 8]):
        add_torgb(f"to_rgbs.{i}", co)
    for i in range(7):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = torch.from_numpy(
            rng.randn(1, 1, res, res).astype(np.float32)
        )

    params = tc.convert_stylegan2_generator(sd, size, n_mlp=n_mlp)
    z = jnp.asarray(rng.randn(2, style_dim).astype(np.float32))
    img = sg2.generator_forward(params, z)
    assert img.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_walk_checkpoint_roundtrip(tmp_path):
    """Pickle a walk-module lookalike under the reference's module path and
    load it through the stub machinery."""
    tc._register_walk_stubs()
    import sys

    cls = getattr(
        sys.modules["graphs.stylegan_v2_real.transform_base"], "WalkLinearMultiW"
    )
    m = cls()
    m.w = torch.nn.Parameter(torch.randn(2, 14, 512))
    path = str(tmp_path / "model_w_0_walk_module.ckpt")
    torch.save(m, path)

    name, state = tc.load_walk_checkpoint(path)
    assert name == "WalkLinearMultiW"
    converted = tc.convert_walk_state(name, state, ["Smiling", "Young"])
    assert converted["w"].shape == (2, 14, 512)
    np.testing.assert_allclose(converted["w"], m.w.detach().numpy())


def test_d_flatten_permutation():
    """The discriminator converter permutes final_lin1's input rows from the
    torch NCHW flatten order (c,h,w) to our NHWC (h,w,c); verify with a torch
    linear oracle on the same tensor."""
    rng = np.random.RandomState(0)
    c = 6
    x = rng.randn(2, c, 4, 4).astype(np.float32)  # NCHW activation
    w = rng.randn(10, c * 16).astype(np.float32)  # torch [out, in]
    b = rng.randn(10).astype(np.float32)
    with torch.no_grad():
        want = (
            torch.from_numpy(x).reshape(2, -1) @ torch.from_numpy(w).T
            + torch.from_numpy(b)
        ).numpy()

    # converter's permutation logic (torch_convert.convert_stylegan2_discriminator)
    w0 = np.transpose(w, (1, 0))  # [in, out]
    idx = np.arange(w0.shape[0]).reshape(c, 4, 4)
    perm = np.transpose(idx, (1, 2, 0)).reshape(-1)
    w_nhwc = w0[perm]

    x_nhwc = np.transpose(x, (0, 2, 3, 1)).reshape(2, -1)
    got = x_nhwc @ w_nhwc + b
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
