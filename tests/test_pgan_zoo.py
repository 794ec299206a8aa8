"""GAN-zoo PGAN generator + converter parity vs an inline torch oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.models import pgan_zoo

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402


class EqLinear(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.module = nn.Linear(din, dout)
        self.module.weight.data.normal_()
        self.module.bias.data.zero_()
        import math

        self.scale = math.sqrt(2.0 / din)

    def forward(self, x):
        return torch.nn.functional.linear(
            x, self.module.weight * self.scale, self.module.bias
        )


class EqConv(nn.Module):
    def __init__(self, cin, cout, k, padding):
        super().__init__()
        self.module = nn.Conv2d(cin, cout, k, padding=padding)
        self.module.weight.data.normal_()
        self.module.bias.data.zero_()
        import math

        self.scale = math.sqrt(2.0 / (cin * k * k))
        self.padding = padding

    def forward(self, x):
        return torch.nn.functional.conv2d(
            x, self.module.weight * self.scale, self.module.bias,
            padding=self.padding,
        )


class TorchGNet(nn.Module):
    """GNet-compatible oracle (depths (16, 8, 8) => 16x16 output)."""

    def __init__(self, dim_latent=32, depths=(16, 8, 8)):
        super().__init__()
        self.formatLayer = EqLinear(dim_latent, depths[0] * 16)
        self.groupScale0 = nn.ModuleList([EqConv(depths[0], depths[0], 3, 1)])
        self.scaleLayers = nn.ModuleList()
        self.toRGBLayers = nn.ModuleList([EqConv(depths[0], 3, 1, 0)])
        prev = depths[0]
        for d in depths[1:]:
            self.scaleLayers.append(
                nn.ModuleList([EqConv(prev, d, 3, 1), EqConv(d, d, 3, 1)])
            )
            self.toRGBLayers.append(EqConv(d, 3, 1, 0))
            prev = d

    @staticmethod
    def norm(x):
        return x * (((x**2).mean(dim=1, keepdim=True) + 1e-8).rsqrt())

    def forward(self, z, alpha=0.0):
        x = self.norm(z)
        x = torch.nn.functional.leaky_relu(self.formatLayer(x), 0.2)
        x = x.view(x.size(0), -1, 4, 4)
        x = self.norm(x)
        for conv in self.groupScale0:
            x = self.norm(torch.nn.functional.leaky_relu(conv(x), 0.2))
        prev_rgb = None
        n = len(self.scaleLayers)
        up = nn.Upsample(scale_factor=2, mode="nearest")
        for si, group in enumerate(self.scaleLayers):
            if si == n - 1 and 0 < alpha < 1:
                prev_rgb = up(self.toRGBLayers[si](x))
            x = up(x)
            for conv in group:
                x = self.norm(torch.nn.functional.leaky_relu(conv(x), 0.2))
        out = self.toRGBLayers[-1](x)
        if prev_rgb is not None:
            out = alpha * prev_rgb + (1 - alpha) * out
        return out


@pytest.mark.parametrize("alpha", [0.0, 0.35])
def test_pgan_zoo_matches_oracle(alpha):
    tm = TorchGNet().eval()
    from latent2im_tpu.io import torch_convert as tc

    params = tc.convert_ganzoo_pgan(tm.state_dict())
    assert pgan_zoo.resolution(params) == 16
    z = np.random.RandomState(0).randn(2, 32).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(z), alpha=alpha).numpy()
    got = pgan_zoo.generator_forward(params, jnp.asarray(z), alpha=alpha)
    from helpers import assert_close

    # deep pixel-norm chains amplify TPU bf16x3 conv noise; CPU is the
    # strict gate
    assert_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
                 rtol=2e-3, atol=2e-3, tpu_rtol=0.25, tpu_atol=0.25)


def test_pgan_zoo_init_shapes():
    params = pgan_zoo.init_generator(jax.random.PRNGKey(0), dim_latent=32,
                                     depths=(16, 8))
    img = pgan_zoo.generator_forward(
        params, jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    )
    assert img.shape == (2, 8, 8, 3)


def test_pgan_zoo_discriminator():
    params = pgan_zoo.init_discriminator(
        jax.random.PRNGKey(0), depths=(16, 8, 8)
    )
    img = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3)) * 0.1
    out = pgan_zoo.discriminator_forward(params, img)
    assert out.shape == (4, 1)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(im):
        return jnp.sum(pgan_zoo.discriminator_forward(params, im))

    g = jax.grad(loss)(img)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_minibatch_stddev_zoo_contiguous_unbiased():
    """Zoo miniBatchStdDev groups CONTIGUOUSLY with unbiased variance and
    assigns each group's stat to its own members (mini_batch_stddev_module
    semantics)."""
    from latent2im_tpu.models.pgan_zoo import _minibatch_stddev_zoo

    rng = np.random.RandomState(0)
    x = rng.randn(8, 4, 4, 2).astype(np.float32)
    out = np.asarray(_minibatch_stddev_zoo(jnp.asarray(x)))
    assert out.shape == (8, 4, 4, 3)
    for gi in range(2):  # groups {0..3}, {4..7}
        grp = x[gi * 4 : (gi + 1) * 4]
        want = np.sqrt(grp.var(axis=0, ddof=1) + 1e-8).mean()
        np.testing.assert_allclose(out[gi * 4 : (gi + 1) * 4, :, :, 2],
                                   want, rtol=1e-5)


def test_zoo_discriminator_no_bool_leaves():
    """Param pytrees hold only float array leaves (repo jit-argument rule);
    the std-channel choice is inferred from group0_conv's input width."""
    import jax as _jax

    from latent2im_tpu.models import pgan_zoo as pz

    for mb in (True, False):
        params = pz.init_discriminator(_jax.random.PRNGKey(0),
                                       depths=(16, 16, 16),
                                       minibatch_stddev=mb)
        for leaf in _jax.tree_util.tree_leaves(params):
            assert hasattr(leaf, "dtype"), f"non-array leaf: {leaf!r}"
        img = _jax.random.normal(_jax.random.PRNGKey(1), (4, 16, 16, 3))
        out = pz.discriminator_forward(params, img)
        assert out.shape[0] == 4
