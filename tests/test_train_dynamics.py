"""Training-DYNAMICS parity: the full jitted walk-train step vs an inline
torch reference train step, tracked over multiple optimizer steps.

Forward-pass parity (test_stylegan2_torch_oracle / test_towers_convert) pins
each tower; this test pins the whole training iteration — the reference's
optimizeParametersAll (graphs/stylegan_v2_real/transform_base.py:456-490):

    alpha_org = R(G(w))[:, attrIdx]
    delta     = sampled - alpha_org            (get_alphas, :405-410)
    w_new     = walk(w, delta)                 (WalkLinearMultiW, :66-83)
    loss      = 10*BCE(R(G(w_new)), sampled)   (:412-424)
              + 0.05*mean_i MSE(vgg_i(org).detach(), vgg_i(new))  (:426-454)
              + 0.05*BCEWithLogits(D(new), 1)  (:460-463)
    Adam(lr, betas=(0.5, 0.99)) on walk params only (:329-331)

run for several steps on fixed z/alpha with the stored noise buffers, with
losses and the walk-parameter trajectory compared step-for-step. A committed
fixture (tests/fixtures/train_dynamics_tiny.npz, regenerate with
`python tests/test_train_dynamics.py`) guards both sides against silent
drift; the torch oracle is also run live when torch is available.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_stylegan2_torch_oracle import (  # noqa: E402
    CHANNELS,
    N_MLP,
    SIZE,
    STYLE_DIM,
    TDiscriminator,
    TGenerator,
)
from test_towers_convert import TorchResNet50, torch_vgg_features  # noqa: E402

from latent2im_tpu.engine import train as train_eng  # noqa: E402
from latent2im_tpu.engine.editor import Editor, EditorConfig  # noqa: E402
from latent2im_tpu.io import torch_convert as tc  # noqa: E402
from latent2im_tpu.models import vgg as vggm  # noqa: E402
from latent2im_tpu.walks import walks as W  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "train_dynamics_tiny.npz")

SEED = 11
ATTR_IDX = (1, 3, 5, 7)
ATTR_LIST = ("a1", "a3", "a5", "a7")
N_REG_OUT = 10
BATCH = 2
N_STEPS = 6
LR = 1e-4


# ---------------------------------------------------------------------------
# torch reference train step (reference semantics, independent implementation)
# ---------------------------------------------------------------------------


def t_synth_from_latent(tg, latent):
    """TGenerator synthesis from a W+ stack with the stored noise buffers
    (the generator_forward(input_is_latent=True) path, networks.py:476-518)."""
    noise = [getattr(tg.noises, f"noise_{i}") for i in range(tg.num_layers)]
    out = tg.input["input"].repeat(latent.shape[0], 1, 1, 1)
    out = tg.conv1(out, latent[:, 0], noise[0])
    skip = tg.to_rgb1(out, latent[:, 1])
    i = 1
    for conv1, conv2, n1, n2, to_rgb in zip(
        tg.convs[::2], tg.convs[1::2], noise[1::2], noise[2::2], tg.to_rgbs
    ):
        out = conv1(out, latent[:, i], n1)
        out = conv2(out, latent[:, i + 1], n2)
        skip = to_rgb(out, latent[:, i + 2], skip)
        i += 2
    return skip


def t_bce(pred, y, eps=1e-12):
    """The reference's handwritten raw BCE (transform_base.py:412-414)."""
    return -(y * pred.clamp(min=eps).log()
             + (1 - y) * (1 - pred).clamp(min=eps).log()).mean()


def t_content_loss(tvgg, org, new):
    """conv_1..conv_4 tap MSEs after ImageNet-normalizing the [-1,1] images
    directly (transform_base.py:426-454 + Normalization)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h_org = (org.detach() - mean) / std
    h_new = (new - mean) / std
    losses = []
    conv_count = 0
    for layer in tvgg:
        if isinstance(layer, nn.ReLU):
            # non-inplace: the inplace oracle ReLU would clobber the tapped
            # conv outputs the MSE backward needs
            h_org, h_new = F.relu(h_org), F.relu(h_new)
            continue
        h_org = layer(h_org)
        h_new = layer(h_new)
        if isinstance(layer, nn.Conv2d):
            conv_count += 1
            losses.append(F.mse_loss(h_org.detach(), h_new))
            if conv_count == 4:
                break
    return sum(losses) / len(losses)


def _build_world():
    """All torch towers + fixed inputs, reproducible from SEED."""
    torch.manual_seed(SEED)
    tg = TGenerator(SIZE, STYLE_DIM, N_MLP, CHANNELS).eval()
    td = TDiscriminator(SIZE, CHANNELS).eval()
    tr = TorchResNet50(num_outputs=N_REG_OUT).eval()
    tvgg = torch_vgg_features(vggm.CFGS["vgg19"]).eval()

    rng = np.random.RandomState(SEED)
    walk0 = (0.02 * rng.randn(len(ATTR_LIST), 2 * int(np.log2(SIZE)) - 2,
                              STYLE_DIM)).astype(np.float32)
    zs = rng.randn(N_STEPS, BATCH, STYLE_DIM).astype(np.float32)
    alphas = rng.uniform(0.0, 1.0, (N_STEPS, BATCH, len(ATTR_LIST))
                         ).astype(np.float32)
    return tg, td, tr, tvgg, walk0, zs, alphas


def run_torch_reference():
    """Torch-side reference run -> (losses [T], walk trajectory [T, A, L, D])."""
    tg, td, tr, tvgg, walk0, zs, alphas = _build_world()
    walk = nn.Parameter(torch.from_numpy(walk0).clone())
    opt = torch.optim.Adam([walk], lr=LR, betas=(0.5, 0.99))
    attr_idx = torch.tensor(ATTR_IDX)

    losses, traj = [], []
    for t in range(N_STEPS):
        z = torch.from_numpy(zs[t])
        sampled = torch.from_numpy(alphas[t])
        opt.zero_grad()
        with torch.no_grad():
            w = tg.map_style(z)
            latent = w.unsqueeze(1).repeat(1, tg.n_latent, 1)
            img_org = t_synth_from_latent(tg, latent)
            alpha_org = tr(img_org)[:, attr_idx]
        delta = sampled - alpha_org
        latent_new = latent + torch.einsum("ba,ald->bld", delta, walk)
        img_new = t_synth_from_latent(tg, latent_new)
        preds = tr(img_new)[:, attr_idx]
        reg = t_bce(preds, sampled.to(torch.double)).float()
        content = t_content_loss(tvgg, img_org, img_new)
        gan = F.softplus(-td(img_new)).mean()
        loss = 10.0 * reg + 0.05 * content + 0.05 * gan
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        traj.append(walk.detach().numpy().copy())
    return np.asarray(losses, np.float64), np.stack(traj)


def run_jax():
    """The production make_train_step on the converted towers, host-alpha
    injection, stored noise buffers -> (losses, walk trajectory)."""
    tg, td, tr, tvgg, walk0, zs, alphas = _build_world()
    g_params = tc.convert_stylegan2_generator(tg.state_dict(), SIZE,
                                              n_mlp=N_MLP)
    d_params = tc.convert_stylegan2_discriminator(td.state_dict(), SIZE)
    reg_params = tc.convert_resnet50(tr.state_dict())
    vgg_params = tc.convert_vgg_features(tvgg.state_dict(), "vgg19")

    cfg = EditorConfig(
        latent="w", walk_kind="linear_w", attr_list=ATTR_LIST,
        attr_idx=ATTR_IDX, size=SIZE, dim_z=STYLE_DIM,
        alpha_mode="target", fixed_noise=True,
    )
    editor = Editor(cfg, g_params, reg_params, vgg_params=vgg_params,
                    d_params=d_params)
    optimizer = train_eng.make_optimizer(LR)
    walk_params = {"w": jnp.asarray(walk0)}
    opt_state = optimizer.init(walk_params)
    step = train_eng.make_train_step(editor, None, optimizer,
                                     host_alpha=True)

    key = jax.random.PRNGKey(0)  # unused under fixed_noise + host_alpha
    losses, traj = [], []
    for t in range(N_STEPS):
        walk_params, opt_state, metrics = step(
            walk_params, opt_state, jnp.asarray(zs[t]), key,
            sampled=jnp.asarray(alphas[t]),
        )
        losses.append(float(metrics["loss"]))
        traj.append(np.asarray(walk_params["w"]).copy())
    return np.asarray(losses, np.float64), np.stack(traj)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture_data():
    if not os.path.exists(FIXTURE):
        pytest.skip("committed fixture missing (python tests/test_train_dynamics.py)")
    return np.load(FIXTURE)


def test_torch_oracle_matches_committed_fixture(fixture_data):
    """Guards the oracle itself against silent drift (torch/env changes)."""
    losses, traj = run_torch_reference()
    np.testing.assert_allclose(losses, fixture_data["losses"], rtol=1e-5)
    np.testing.assert_allclose(traj, fixture_data["walk_traj"],
                               rtol=1e-4, atol=1e-7)


def test_jax_train_step_tracks_reference_dynamics(fixture_data):
    """The committed torch loss/param trajectories, reproduced by the
    production jitted train step over N_STEPS optimizer steps.

    CPU-only by design: this is the strict f32 training-dynamics parity
    gate. On TPU the same step runs f32 matmuls as bf16x3 passes, and the
    raw-BCE log clamps amplify that over 6 steps into drift that says
    nothing about correctness (the TPU suite covers compile+run of the
    identical step via test_engine/test_cli_e2e)."""
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("strict f32 dynamics gate; TPU runs bf16x3 matmuls")
    losses, traj = run_jax()
    want_losses = fixture_data["losses"]
    want_traj = fixture_data["walk_traj"]
    # losses: reg-BCE on raw regressor outputs amplifies tiny forward diffs
    # through the log clamps; 0.5% per-step tolerance holds over 6 steps.
    np.testing.assert_allclose(losses, want_losses, rtol=5e-3)
    # walk params: updates are Adam-normalized (~lr-magnitude); compare the
    # cumulative DELTA from init, not the raw values (init cancels exactly).
    _, _, _, _, walk0, _, _ = _build_world()
    np.testing.assert_allclose(traj - walk0[None], want_traj - walk0[None],
                               rtol=5e-2, atol=2e-6)


if __name__ == "__main__":
    losses, traj = run_torch_reference()
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, losses=losses, walk_traj=traj)
    print("wrote", FIXTURE, "losses:", losses)
