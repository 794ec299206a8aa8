"""LPIPS parity vs an inline torch oracle (official PerceptualSimilarity
math: ScalingLayer -> vgg16 relu1_2/2_2/3_3/4_3/5_3 -> channel unit-norm ->
squared diff -> non-negative 1x1 heads -> spatial mean -> sum)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from helpers import assert_close  # noqa: E402
from latent2im_tpu.io import torch_convert as tc  # noqa: E402
from latent2im_tpu.models import lpips as lp  # noqa: E402
from latent2im_tpu.models import vgg as vggm  # noqa: E402
from test_towers_convert import torch_vgg_features  # noqa: E402

TAP_SLICES = (4, 9, 16, 23, 30)  # relu1_2/2_2/3_3/4_3/5_3 in vgg16.features


def torch_lpips(feats_model, lin_ws, x0, x1):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(x):
        h = (x - shift) / scale
        outs = []
        for i, layer in enumerate(feats_model):
            h = layer(h)
            if i + 1 in TAP_SLICES:
                outs.append(h)
        return outs

    def unit(f):
        return f / (torch.sqrt(torch.sum(f**2, dim=1, keepdim=True)) + 1e-10)

    total = 0.0
    for f0, f1, w in zip(taps(x0), taps(x1), lin_ws):
        d = (unit(f0) - unit(f1)) ** 2
        val = (d * w.view(1, -1, 1, 1)).sum(dim=1).mean(dim=(1, 2))
        total = total + val
    return total


def test_lpips_matches_torch_oracle():
    torch.manual_seed(0)
    tm = torch_vgg_features(vggm.CFGS["vgg16"]).eval()
    vgg_params = tc.convert_vgg_features(tm.state_dict(), "vgg16")

    rng = np.random.RandomState(1)
    lin_ws = [torch.from_numpy(rng.uniform(0, 0.2, c).astype(np.float32))
              for c in lp.LPIPS_CHANNELS]
    # route through the converter's official key layout
    lin_sd = {f"lin{i}.model.1.weight": w.view(1, -1, 1, 1)
              for i, w in enumerate(lin_ws)}
    params = tc.convert_lpips(lin_sd, vgg_params)

    x0 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_lpips(tm, lin_ws, torch.from_numpy(x0),
                           torch.from_numpy(x1)).numpy()
    got = lp.lpips_forward(
        params,
        jnp.asarray(np.transpose(x0, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(x1, (0, 2, 3, 1))),
    )
    assert_close(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_lpips_identity_is_zero_and_symmetric():
    params = lp.init_lpips(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1,
                           maxval=1)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3), minval=-1,
                           maxval=1)
    assert np.allclose(np.asarray(lp.lpips_forward(params, x, x)), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lp.lpips_forward(params, x, y)),
        np.asarray(lp.lpips_forward(params, y, x)),
        rtol=1e-5,
    )
    assert np.all(np.asarray(lp.lpips_forward(params, x, y)) > 0)
