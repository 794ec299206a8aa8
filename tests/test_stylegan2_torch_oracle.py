"""Flagship StyleGAN2 G/D value parity vs an inline torch oracle.

The riskiest conversion in the system is the rosinality StyleGAN2 layout
(reference: graphs/stylegan_v2_real/networks.py): the modulated up-conv with
its weight transpose (networks.py:247-252), lr_mul=0.01 style MLP scale
baking (networks.py:135-156), noise buffers (networks.py:281-286), and the
blur pad arithmetic. The tests here build a tiny torch generator /
discriminator in the exact rosinality module layout (state_dict keys match),
convert with io.torch_convert, and require value-level output parity with
injected noise — the same standard the pggan/pgan_zoo/stylegan1/resnet/vgg
backends already meet.

The torch side re-derives upfirdn2d from its documented semantics
(zero-insert upsample -> pad -> correlate with flipped kernel -> stride
downsample, reference op/upfirdn2d.py:152-187) rather than importing the
reference (whose op/ JIT-builds CUDA at import).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from helpers import assert_close, assert_images_close  # noqa: E402
from latent2im_tpu.io import torch_convert as tc  # noqa: E402
from latent2im_tpu.models import stylegan2 as sg2  # noqa: E402


# ---------------------------------------------------------------------------
# torch primitives (rosinality semantics, independent implementation)
# ---------------------------------------------------------------------------


def upfirdn2d_t(x, kernel, up=1, down=1, pad=(0, 0)):
    """NCHW upfirdn: zero-insert up, pad, correlate flipped kernel, stride."""
    n, c, h, w = x.shape
    kh, kw = kernel.shape
    if up > 1:
        z = x.new_zeros(n, c, h, up, w, up)
        z[:, :, :, 0, :, 0] = x
        x = z.view(n, c, h * up, w * up)
    x = F.pad(x, (pad[0], pad[1], pad[0], pad[1]))
    wgt = torch.flip(kernel, (0, 1)).view(1, 1, kh, kw).repeat(c, 1, 1, 1)
    x = F.conv2d(x, wgt, groups=c)
    return x[:, :, ::down, ::down]


def blur_kernel_t(k=(1, 3, 3, 1), gain=1.0):
    k = torch.tensor(k, dtype=torch.float32)
    k = k[None, :] * k[:, None]
    return k / k.sum() * gain


def fused_lrelu_t(x, bias, slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        shape = [1, -1] + [1] * (x.ndim - 2)
        x = x + bias.view(*shape)
    return F.leaky_relu(x, slope) * scale


class TEqualLinear(nn.Module):
    def __init__(self, in_dim, out_dim, bias_init=0.0, lr_mul=1.0, activation=False):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(out_dim, in_dim) / lr_mul)
        self.bias = nn.Parameter(torch.full((out_dim,), float(bias_init)))
        self.scale = (1 / math.sqrt(in_dim)) * lr_mul
        self.lr_mul = lr_mul
        self.activation = activation

    def forward(self, x):
        out = F.linear(x, self.weight * self.scale)
        if self.activation:
            return fused_lrelu_t(out, self.bias * self.lr_mul)
        return out + self.bias * self.lr_mul


class TModulatedConv2d(nn.Module):
    """Grouped-conv modulated conv exactly as networks.py:176-272."""

    def __init__(self, cin, cout, k, style_dim, demodulate=True, upsample=False):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(1, cout, cin, k, k))
        self.modulation = TEqualLinear(style_dim, cin, bias_init=1.0)
        self.scale = 1 / math.sqrt(cin * k * k)
        self.k, self.cin, self.cout = k, cin, cout
        self.demodulate = demodulate
        self.upsample = upsample
        if upsample:
            p = (4 - 2) - (k - 1)
            self.blur_pad = ((p + 1) // 2 + 1, p // 2 + 1)
            self.blur_k = blur_kernel_t(gain=4.0)

    def forward(self, x, style):
        b, cin, h, w = x.shape
        s = self.modulation(style).view(b, 1, cin, 1, 1)
        weight = self.scale * self.weight * s
        if self.demodulate:
            demod = torch.rsqrt(weight.pow(2).sum([2, 3, 4]) + 1e-8)
            weight = weight * demod.view(b, self.cout, 1, 1, 1)
        if self.upsample:
            x = x.view(1, b * cin, h, w)
            weight = weight.transpose(1, 2).reshape(b * cin, self.cout, self.k, self.k)
            out = F.conv_transpose2d(x, weight, padding=0, stride=2, groups=b)
            out = out.view(b, self.cout, out.shape[2], out.shape[3])
            return upfirdn2d_t(out, self.blur_k, pad=self.blur_pad)
        weight = weight.view(b * self.cout, cin, self.k, self.k)
        x = x.view(1, b * cin, h, w)
        out = F.conv2d(x, weight, padding=self.k // 2, groups=b)
        return out.view(b, self.cout, out.shape[2], out.shape[3])


class TNoise(nn.Module):
    def __init__(self):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(1))

    def forward(self, img, noise):
        return img + self.weight * noise


class TFusedLeakyReLU(nn.Module):
    def __init__(self, channel):
        super().__init__()
        self.bias = nn.Parameter(torch.zeros(channel))

    def forward(self, x):
        return fused_lrelu_t(x, self.bias)


class TStyledConv(nn.Module):
    def __init__(self, cin, cout, k, style_dim, upsample=False):
        super().__init__()
        self.conv = TModulatedConv2d(cin, cout, k, style_dim, upsample=upsample)
        self.noise = TNoise()
        self.activate = TFusedLeakyReLU(cout)

    def forward(self, x, style, noise):
        return self.activate(self.noise(self.conv(x, style), noise))


class TToRGB(nn.Module):
    def __init__(self, cin, style_dim, upsample=True):
        super().__init__()
        self.conv = TModulatedConv2d(cin, 3, 1, style_dim, demodulate=False)
        self.bias = nn.Parameter(torch.zeros(1, 3, 1, 1))
        self.upsample = upsample
        if upsample:
            self.up_k = blur_kernel_t(gain=4.0)

    def forward(self, x, style, skip=None):
        out = self.conv(x, style) + self.bias
        if skip is not None:
            p = self.up_k.shape[0] - 2
            skip = upfirdn2d_t(skip, self.up_k, up=2,
                               pad=((p + 1) // 2 + 1, p // 2))
            out = out + skip
        return out


class TGenerator(nn.Module):
    """Tiny rosinality-layout generator; emits reference state_dict keys."""

    def __init__(self, size, style_dim, n_mlp, channels):
        super().__init__()
        self.size, self.style_dim = size, style_dim
        self.log_size = int(math.log2(size))
        self.n_latent = self.log_size * 2 - 2
        self.num_layers = (self.log_size - 2) * 2 + 1
        # style.0 is PixelNorm in the reference Sequential; start names at 1.
        self.style = nn.ModuleDict(
            {str(i + 1): TEqualLinear(style_dim, style_dim, lr_mul=0.01,
                                      activation=True) for i in range(n_mlp)}
        )
        self.input = nn.ParameterDict(
            {"input": nn.Parameter(torch.randn(1, channels[4], 4, 4))}
        )
        self.conv1 = TStyledConv(channels[4], channels[4], 3, style_dim)
        self.to_rgb1 = TToRGB(channels[4], style_dim, upsample=False)
        self.convs = nn.ModuleList()
        self.to_rgbs = nn.ModuleList()
        self.noises = nn.Module()
        for i in range(self.num_layers):
            res = 2 ** ((i + 5) // 2)
            self.noises.register_buffer(f"noise_{i}", torch.randn(1, 1, res, res))
        cin = channels[4]
        for i in range(3, self.log_size + 1):
            cout = channels[2 ** i]
            self.convs.append(TStyledConv(cin, cout, 3, style_dim, upsample=True))
            self.convs.append(TStyledConv(cout, cout, 3, style_dim))
            self.to_rgbs.append(TToRGB(cout, style_dim))
            cin = cout

    def map_style(self, z):
        x = z * torch.rsqrt(torch.mean(z ** 2, dim=1, keepdim=True) + 1e-8)
        for i in range(len(self.style)):
            x = self.style[str(i + 1)](x)
        return x

    def forward(self, z, noise):
        w = self.map_style(z)
        latent = w.unsqueeze(1).repeat(1, self.n_latent, 1)
        out = self.input["input"].repeat(z.shape[0], 1, 1, 1)
        out = self.conv1(out, latent[:, 0], noise[0])
        skip = self.to_rgb1(out, latent[:, 1])
        i = 1
        for conv1, conv2, n1, n2, to_rgb in zip(
            self.convs[::2], self.convs[1::2], noise[1::2], noise[2::2], self.to_rgbs
        ):
            out = conv1(out, latent[:, i], n1)
            out = conv2(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        return skip


# The oracle modules above use the reference's *attribute names*, so
# state_dict keys line up with the rosinality layout the converter expects
# (conv1.conv.weight, conv1.conv.modulation.weight, conv1.noise.weight,
# conv1.activate.bias, to_rgbs.N.bias, noises.noise_N, ...).


SIZE, STYLE_DIM, N_MLP = 32, 64, 2
CHANNELS = {4: 32, 8: 16, 16: 16, 32: 8}


def _build_pair(seed=0):
    torch.manual_seed(seed)
    tg = TGenerator(SIZE, STYLE_DIM, N_MLP, CHANNELS).eval()
    params = tc.convert_stylegan2_generator(tg.state_dict(), SIZE, n_mlp=N_MLP)
    return tg, params


def test_generator_value_parity_fixed_buffers():
    """z -> style MLP -> synthesis with the stored noise buffers."""
    tg, params = _build_pair()
    z = np.random.RandomState(0).randn(2, STYLE_DIM).astype(np.float32)
    noise_t = [getattr(tg.noises, f"noise_{i}") for i in range(tg.num_layers)]
    with torch.no_grad():
        want = tg(torch.from_numpy(z), noise_t).numpy()
    got = sg2.generator_forward(params, jnp.asarray(z))  # default: stored buffers
    assert_images_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_generator_value_parity_injected_noise():
    """Per-sample injected noise (randomize_noise=True parity path)."""
    tg, params = _build_pair(seed=1)
    rng = np.random.RandomState(3)
    z = rng.randn(2, STYLE_DIM).astype(np.float32)
    noise_np = [rng.randn(2, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2))
                .astype(np.float32) for i in range(tg.num_layers)]
    with torch.no_grad():
        want = tg(torch.from_numpy(z),
                  [torch.from_numpy(n) for n in noise_np]).numpy()
    noise_j = [jnp.asarray(np.transpose(n, (0, 2, 3, 1))) for n in noise_np]
    got = sg2.generator_forward(params, jnp.asarray(z), noise=noise_j)
    assert_images_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


def test_wplus_latent_and_walk_shift_parity():
    """input_is_latent path: shifted W+ must match torch under the same shift
    (the editing pipeline's actual synthesis call)."""
    tg, params = _build_pair(seed=2)
    rng = np.random.RandomState(5)
    z = rng.randn(2, STYLE_DIM).astype(np.float32)
    shift = 0.1 * rng.randn(2, tg.n_latent, STYLE_DIM).astype(np.float32)
    noise_t = [getattr(tg.noises, f"noise_{i}") for i in range(tg.num_layers)]
    with torch.no_grad():
        w = tg.map_style(torch.from_numpy(z))
        latent = w.unsqueeze(1).repeat(1, tg.n_latent, 1) + torch.from_numpy(shift)
        out = tg.input["input"].repeat(2, 1, 1, 1)
        out = tg.conv1(out, latent[:, 0], noise_t[0])
        skip = tg.to_rgb1(out, latent[:, 1])
        i = 1
        for conv1, conv2, n1, n2, to_rgb in zip(
            tg.convs[::2], tg.convs[1::2], noise_t[1::2], noise_t[2::2], tg.to_rgbs
        ):
            out = conv1(out, latent[:, i], n1)
            out = conv2(out, latent[:, i + 1], n2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2
        want = skip.numpy()

    w_j = sg2.style_forward(params, jnp.asarray(z))
    latent_j = jnp.repeat(w_j[:, None, :], tg.n_latent, axis=1) + jnp.asarray(shift)
    got = sg2.synthesize(params, latent_j)
    assert_images_close(np.transpose(np.asarray(got), (0, 3, 1, 2)), want)


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


class TBlur(nn.Module):
    def __init__(self, pad):
        super().__init__()
        self.register_buffer("kernel", blur_kernel_t())
        self.pad = pad

    def forward(self, x):
        return upfirdn2d_t(x, self.kernel, pad=self.pad)


class TEqualConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, bias=True):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, k, k))
        self.scale = 1 / math.sqrt(cin * k * k)
        self.stride, self.padding = stride, padding
        self.bias = nn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x):
        return F.conv2d(x, self.weight * self.scale, bias=self.bias,
                        stride=self.stride, padding=self.padding)


def t_conv_layer(cin, cout, k, downsample=False, bias=True, activate=True):
    layers = []
    if downsample:
        p = (4 - 2) + (k - 1)
        layers.append(TBlur(((p + 1) // 2, p // 2)))
        stride, padding = 2, 0
    else:
        stride, padding = 1, k // 2
    layers.append(TEqualConv2d(cin, cout, k, stride, padding,
                               bias=bias and not activate))
    if activate and bias:
        layers.append(TFusedLeakyReLU(cout))
    return nn.Sequential(*layers)


class TResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = t_conv_layer(cin, cin, 3)
        self.conv2 = t_conv_layer(cin, cout, 3, downsample=True)
        self.skip = t_conv_layer(cin, cout, 1, downsample=True,
                                 activate=False, bias=False)

    def forward(self, x):
        return (self.conv2(self.conv1(x)) + self.skip(x)) / math.sqrt(2)


class TDiscriminator(nn.Module):
    def __init__(self, size, channels):
        super().__init__()
        convs = [t_conv_layer(3, channels[size], 1)]
        log_size = int(math.log2(size))
        cin = channels[size]
        for i in range(log_size, 2, -1):
            cout = channels[2 ** (i - 1)]
            convs.append(TResBlock(cin, cout))
            cin = cout
        self.convs = nn.Sequential(*convs)
        self.final_conv = t_conv_layer(cin + 1, channels[4], 3)
        self.final_linear = nn.Sequential(
            TEqualLinear(channels[4] * 16, channels[4], activation=True),
            TEqualLinear(channels[4], 1),
        )

    def forward(self, x):
        out = self.convs(x)
        b, c, h, w = out.shape
        g = min(b, 4)
        std = out.view(g, -1, 1, c, h, w)
        std = torch.sqrt(std.var(0, unbiased=False) + 1e-8)
        std = std.mean([2, 3, 4], keepdims=True).squeeze(2)
        std = std.repeat(g, 1, h, w)
        out = torch.cat([out, std], 1)
        out = self.final_conv(out)
        return self.final_linear(out.view(b, -1))


def test_discriminator_value_parity():
    torch.manual_seed(7)
    td = TDiscriminator(SIZE, CHANNELS).eval()
    params = tc.convert_stylegan2_discriminator(td.state_dict(), SIZE)
    x = np.random.RandomState(9).randn(4, 3, SIZE, SIZE).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(x)).numpy()
    got = sg2.discriminator_forward(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert_close(np.asarray(got), want, rtol=2e-3, atol=2e-3)
