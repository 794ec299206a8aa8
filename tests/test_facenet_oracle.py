"""FaceNet (InceptionResnetV1) converter + architecture value parity vs an
inline torch oracle in the facenet_pytorch module layout.

The reference's eval.py:29-32 embeds faces with facenet_pytorch's
InceptionResnetV1(pretrained='vggface2'); the identity-preservation numbers
depend on embedding-value fidelity, so the converter is pinned numerically
here the same way the G/D/ResNet/VGG converters already are (VERDICT r2
item 8). The oracle re-derives the architecture from facenet_pytorch's
documented structure (BasicConv2d/Block35/Block17/Block8/Mixed_6a/Mixed_7a)
with matching state_dict keys; BN buffers are randomized so running-stat
conversion is actually exercised.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from latent2im_tpu.io import torch_convert as tc  # noqa: E402
from latent2im_tpu.models import facenet as fn  # noqa: E402


class TBasicConv2d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=0.001, momentum=0.1)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TBlock35(nn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = TBasicConv2d(256, 32, 1)
        self.branch1 = nn.Sequential(TBasicConv2d(256, 32, 1),
                                     TBasicConv2d(32, 32, 3, padding=1))
        self.branch2 = nn.Sequential(TBasicConv2d(256, 32, 1),
                                     TBasicConv2d(32, 32, 3, padding=1),
                                     TBasicConv2d(32, 32, 3, padding=1))
        self.conv2d = nn.Conv2d(96, 256, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock17(nn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = TBasicConv2d(896, 128, 1)
        self.branch1 = nn.Sequential(
            TBasicConv2d(896, 128, 1),
            TBasicConv2d(128, 128, (1, 7), padding=(0, 3)),
            TBasicConv2d(128, 128, (7, 1), padding=(3, 0)),
        )
        self.conv2d = nn.Conv2d(256, 896, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock8(nn.Module):
    def __init__(self, scale=0.20, noReLU=False):
        super().__init__()
        self.scale = scale
        self.noReLU = noReLU
        self.branch0 = TBasicConv2d(1792, 192, 1)
        self.branch1 = nn.Sequential(
            TBasicConv2d(1792, 192, 1),
            TBasicConv2d(192, 192, (1, 3), padding=(0, 1)),
            TBasicConv2d(192, 192, (3, 1), padding=(1, 0)),
        )
        self.conv2d = nn.Conv2d(384, 1792, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        out = x + self.scale * self.conv2d(up)
        return out if self.noReLU else F.relu(out)


class TMixed6a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TBasicConv2d(256, 384, 3, stride=2)
        self.branch1 = nn.Sequential(TBasicConv2d(256, 192, 1),
                                     TBasicConv2d(192, 192, 3, padding=1),
                                     TBasicConv2d(192, 256, 3, stride=2))
        self.branch2 = nn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)


class TMixed7a(nn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = nn.Sequential(TBasicConv2d(896, 256, 1),
                                     TBasicConv2d(256, 384, 3, stride=2))
        self.branch1 = nn.Sequential(TBasicConv2d(896, 256, 1),
                                     TBasicConv2d(256, 256, 3, stride=2))
        self.branch2 = nn.Sequential(TBasicConv2d(896, 256, 1),
                                     TBasicConv2d(256, 256, 3, padding=1),
                                     TBasicConv2d(256, 256, 3, stride=2))
        self.branch3 = nn.MaxPool2d(3, stride=2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x),
                          self.branch2(x), self.branch3(x)], 1)


class TInceptionResnetV1(nn.Module):
    """facenet_pytorch layout: state_dict keys match what convert_facenet
    expects (conv2d_1a.conv.weight ... last_bn.running_var)."""

    def __init__(self):
        super().__init__()
        self.conv2d_1a = TBasicConv2d(3, 32, 3, stride=2)
        self.conv2d_2a = TBasicConv2d(32, 32, 3)
        self.conv2d_2b = TBasicConv2d(32, 64, 3, padding=1)
        self.maxpool_3a = nn.MaxPool2d(3, stride=2)
        self.conv2d_3b = TBasicConv2d(64, 80, 1)
        self.conv2d_4a = TBasicConv2d(80, 192, 3)
        self.conv2d_4b = TBasicConv2d(192, 256, 3, stride=2)
        self.repeat_1 = nn.Sequential(*[TBlock35() for _ in range(5)])
        self.mixed_6a = TMixed6a()
        self.repeat_2 = nn.Sequential(*[TBlock17() for _ in range(10)])
        self.mixed_7a = TMixed7a()
        self.repeat_3 = nn.Sequential(*[TBlock8() for _ in range(5)])
        self.block8 = TBlock8(scale=1.0, noReLU=True)
        self.last_linear = nn.Linear(1792, 512, bias=False)
        self.last_bn = nn.BatchNorm1d(512, eps=0.001, momentum=0.1)

    def forward(self, x):
        x = self.conv2d_1a(x)
        x = self.conv2d_2a(x)
        x = self.conv2d_2b(x)
        x = self.maxpool_3a(x)
        x = self.conv2d_3b(x)
        x = self.conv2d_4a(x)
        x = self.conv2d_4b(x)
        x = self.repeat_1(x)
        x = self.mixed_6a(x)
        x = self.repeat_2(x)
        x = self.mixed_7a(x)
        x = self.repeat_3(x)
        x = self.block8(x)
        x = x.mean(dim=(2, 3))
        x = self.last_linear(x)
        x = self.last_bn(x)
        return F.normalize(x, p=2, dim=1)


def test_facenet_embedding_value_parity():
    torch.manual_seed(5)
    tm = TInceptionResnetV1().eval()
    # randomize BN running stats so their conversion is actually tested
    g = torch.Generator().manual_seed(17)
    for m in tm.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape,
                                                   generator=g))
            m.running_var.copy_(1.0 + 0.1 * torch.rand(m.running_var.shape,
                                                       generator=g))

    params = tc.convert_facenet(tm.state_dict())

    rng = np.random.RandomState(0)
    # facenet input scale: (uint8 - 127.5) / 128
    x = ((rng.randint(0, 256, (2, 160, 160, 3)) - 127.5) / 128.0).astype(
        np.float32
    )
    with torch.no_grad():
        want = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.asarray(fn.facenet_forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # embeddings are unit-norm on both sides
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)
