"""Device-side geometric targets (tasks/warp.py) vs the cv2 host path.

cv2's INTER_LINEAR is fixed-point (coordinates/weights quantized to 1/32),
the device sampler is exact bilinear — so target parity is gated at ~1e-2 on
smooth unit-scale images and binarized masks may differ on borderline edge
pixels (gated as a mismatch fraction). The device geometric step must also
be mesh-shardable: 8-virtual-device run == single-device run, the same
equivalence standard the main walk step meets.

Reference semantics: utils/transforms.py:8-614 + utils/rotate3d.py:46-119.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latent2im_tpu.tasks import warp as W
from latent2im_tpu.tasks.geometric import (
    ColorLabTransform,
    ColorTransform,
    GEOMETRIC_TASKS,
)
from latent2im_tpu.tasks.transforms import get_task

cv2 = pytest.importorskip("cv2")

SIZE = 64


def smooth_images(b=2, size=SIZE, c=3, seed=0):
    """Low-frequency test images in [-1, 1] — parity gates reflect cv2's
    1/32 coordinate quantization times the image gradient, so band-limited
    content gives a meaningful bound (white noise would not)."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:size, 0:size] / size
    imgs = np.zeros((b, size, size, c), np.float32)
    for bi in range(b):
        for ci in range(c):
            for _ in range(4):
                fy, fx = rng.uniform(0.5, 3, 2)
                ph = rng.uniform(0, 2 * np.pi, 2)
                imgs[bi, :, :, ci] += np.sin(2 * np.pi * fy * ys + ph[0]) * \
                    np.cos(2 * np.pi * fx * xs + ph[1])
    return (imgs / 4).astype(np.float32)


def _compare(task, alpha, imgs, target_tol=2e-2, mask_frac=0.08):
    want_t, want_m = task.get_target_np(np.asarray(imgs, np.float64), alpha)
    kind, payload, clamp = task.device_spec(alpha, imgs.shape[1])
    assert kind == "warp"
    got_t, got_m = W.warp_target_and_mask(jnp.asarray(imgs), payload["minv"],
                                          clamp=clamp, box=payload["box"])
    got_t, got_m = np.asarray(got_t), np.asarray(got_m)
    both = (got_m > 0) & (want_m > 0)
    diff = np.abs(got_t - want_t)[both]
    assert diff.max() < target_tol, (float(diff.max()), alpha)
    assert np.mean(got_m != want_m) < mask_frac, (np.mean(got_m != want_m),
                                                  alpha)


@pytest.mark.parametrize("alpha", [0, 3, -5, 2.5])
def test_shiftx_matches_cv2(alpha):
    _compare(get_task("shiftx", img_size=SIZE), alpha, smooth_images())


@pytest.mark.parametrize("alpha", [4, -2.5])
def test_shifty_matches_cv2(alpha):
    _compare(get_task("shifty", img_size=SIZE), alpha, smooth_images(seed=1))


@pytest.mark.parametrize("alpha", [0, 17, -30])
def test_rotate2d_matches_cv2(alpha):
    _compare(get_task("rotate2d", img_size=SIZE), alpha, smooth_images(seed=2))


@pytest.mark.parametrize("alpha", [1.0, 0.7, 0.53, 1.37, 2.0])
def test_zoom_matches_cv2(alpha):
    _compare(get_task("zoom", img_size=SIZE), alpha, smooth_images(seed=3))


@pytest.mark.parametrize("alpha", [0, 30, -45])
def test_rotate3d_matches_cv2(alpha):
    # perspective warps compress many src pixels near the fold; the mask
    # boundary there is longer, allow a slightly larger mismatch band
    _compare(get_task("rotate3d", img_size=SIZE), alpha, smooth_images(seed=4),
             mask_frac=0.1)


def test_color_device_matches_host():
    imgs = smooth_images(seed=5)
    task = ColorTransform()
    alpha = np.array([[0.2, -0.1, 0.05], [0.0, 0.3, -0.2]], np.float32)
    want_t, want_m = task.get_target_np(imgs.copy(), alpha)
    kind, payload, _ = task.device_spec(alpha, SIZE)
    assert kind == "color"
    got_t, got_m = W.color_target(jnp.asarray(imgs), jnp.asarray(payload))
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_m), want_m)


def test_colorlab_device_matches_host():
    imgs = smooth_images(seed=6)
    task = ColorLabTransform()
    alpha = np.array([[0.1, -0.2, 0.15], [0.05, 0.0, -0.1]], np.float32)
    want_t, _ = task.get_target_np(imgs.copy().astype(np.float64), alpha)
    kind, payload, _ = task.device_spec(alpha, SIZE)
    assert kind == "colorlab"
    got_t, _ = W.colorlab_target(jnp.asarray(imgs), jnp.asarray(payload))
    # f32 device colorspace math vs the host's f64
    np.testing.assert_allclose(np.asarray(got_t), want_t, atol=2e-3)


def test_every_geometric_task_has_device_spec():
    for name in GEOMETRIC_TASKS:
        if name in ("color", "colorlab"):
            task, alpha = get_task(name), np.zeros((2, 3), np.float32)
        else:
            task = get_task(name, img_size=SIZE)
            alpha = 1.0 if name == "zoom" else 0.0
        kind, payload, clamp = task.device_spec(alpha, SIZE)
        assert kind in ("warp", "color", "colorlab")


# ---------------------------------------------------------------------------
# the fully-jitted step: mesh equivalence + zero host warps
# ---------------------------------------------------------------------------

TINY = {4: 16, 8: 16, 16: 8, 32: 8}


def _tiny_editor():
    from latent2im_tpu.engine.editor import Editor, EditorConfig
    from latent2im_tpu.models import resnet as rn
    from latent2im_tpu.models import stylegan2 as sg2
    from latent2im_tpu.walks import init_walk

    key = jax.random.PRNGKey(0)
    kg, kr, kw = jax.random.split(key, 3)
    g = sg2.init_generator(kg, 32, style_dim=32, n_mlp=2, channels=TINY)
    cfg = EditorConfig(size=32, dim_z=32, walk_kind="linear_w",
                       attr_list=("zoom",), attr_idx=(0,))
    ed = Editor(cfg, g, reg_params=rn.init_resnet50(kr, num_outputs=4))
    walk = init_walk(kw, "linear_w", 32, cfg.n_latent, ["zoom"])
    return ed, walk


def test_device_step_mesh_equivalence():
    """One device-target step on the 8-device mesh == single device."""
    from latent2im_tpu.engine.train import (
        make_geometric_device_step,
        make_optimizer,
    )
    from latent2im_tpu.parallel import mesh as meshlib

    ed, walk = _tiny_editor()
    task = get_task("zoom", img_size=32)
    opt = make_optimizer(5e-3)
    z = np.random.RandomState(0).randn(8, 32).astype(np.float32)
    alpha_graph = np.full((8, 1), np.log(0.8), np.float32)
    spec = task.device_spec(0.8, 32)

    results = {}
    for name, mesh in (("single", None), ("mesh", meshlib.make_mesh(8))):
        step = make_geometric_device_step(ed, opt, mesh=mesh)
        w = jax.tree_util.tree_map(jnp.copy, walk)
        st = opt.init(w)
        zz = meshlib.shard_batch(mesh, z) if mesh is not None else jnp.asarray(z)
        w, st, m = step(w, st, zz, jnp.asarray(alpha_graph), spec)
        results[name] = (np.asarray(w["w"]), float(m["loss"]))

    np.testing.assert_allclose(results["mesh"][0], results["single"][0],
                               rtol=2e-5, atol=1e-6)
    assert abs(results["mesh"][1] - results["single"][1]) < 1e-5


def test_device_loop_runs_with_zero_host_warps(monkeypatch):
    """geometric_train_loop(device_targets=True) must never call
    get_target_np, and the loss must decrease."""
    from latent2im_tpu.engine.train import geometric_train_loop

    ed, walk = _tiny_editor()
    task = get_task("zoom", img_size=32)
    monkeypatch.setattr(
        type(task), "get_target_np",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("host warp called in device mode")),
    )
    w, hist = geometric_train_loop(
        ed, task, walk, num_samples=8, batch_size=4, n_epochs=3, lr=5e-3,
        seed=0, log_every=1,
    )
    assert all(np.isfinite(hist))
    assert np.mean(hist[-2:]) < np.mean(hist[:2]), hist
