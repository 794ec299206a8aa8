"""Geometric/color task tests: target+mask semantics."""

import numpy as np
import pytest

from latent2im_tpu.tasks.geometric import (
    ColorLabTransform,
    ColorTransform,
    Rotate2DTransform,
    Rotate3DTransform,
    ShiftXTransform,
    ShiftYTransform,
    ZoomTransform,
    lab2rgb,
    rgb2lab,
)
from latent2im_tpu.tasks.transforms import get_task, lerp, slerp


def _imgs(b=2, s=16):
    return np.random.RandomState(0).rand(b, s, s, 3).astype(np.float32) * 2 - 1


def test_color_target():
    t = ColorTransform()
    x = _imgs()
    alpha = np.array([[0.1, -0.2, 0.3], [0.0, 0.0, 0.5]], np.float32)
    target, mask = t.get_target_np(x, alpha)
    np.testing.assert_allclose(target[0, :, :, 0], x[0, :, :, 0] + 0.1, rtol=1e-5)
    np.testing.assert_allclose(mask, 1.0)


def test_color_zero_alpha_identity():
    t = ColorTransform()
    x = _imgs()
    target, mask = t.get_target_np(x, np.zeros((2, 3)))
    np.testing.assert_allclose(target, x)


def test_lab_roundtrip():
    rgb = np.random.RandomState(1).rand(8, 8, 3)
    back = lab2rgb(rgb2lab(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-4)


def test_colorlab_luminance_shift():
    t = ColorLabTransform()
    x = np.zeros((1, 8, 8, 3), np.float32)  # mid-gray in [-1,1]
    alpha = np.array([[0.3, 0.0, 0.0]], np.float32)  # +L
    target, _ = t.get_target_np(x, alpha)
    assert target.mean() > x.mean()  # brighter


def test_zoom_in_target():
    t = ZoomTransform(img_size=16)
    x = _imgs(1, 16)
    target, mask = t.get_target_np(x, 0.5)
    assert target.shape == x.shape
    np.testing.assert_allclose(mask, 1.0)  # zoom-in: everything valid
    target2, mask2 = t.get_target_np(x, 2.0)  # zoom-out: border invalid
    assert mask2.mean() < 1.0


def test_zoom_log_slider():
    t = ZoomTransform()
    s = t.scale_test_alpha(2.0, 3)
    np.testing.assert_allclose(s, np.log(2.0), rtol=1e-6)


def test_shift_targets():
    for cls, axis in ((ShiftXTransform, 2), (ShiftYTransform, 1)):
        t = cls(img_size=16)
        x = _imgs(1, 16)
        target, mask = t.get_target_np(x, 4)
        assert target.shape == x.shape
        # shifted content: the leading edge of the mask must be invalid
        sl = [slice(None)] * 4
        sl[axis] = slice(0, 3)
        assert np.asarray(mask)[tuple(sl)].mean() < 0.5


def test_rotate2d_target():
    t = Rotate2DTransform(img_size=16)
    x = _imgs(1, 16)
    target, mask = t.get_target_np(x, 30)
    assert target.shape == x.shape
    assert 0.5 < mask.mean() < 1.0  # corners cut


def test_rotate3d_target():
    t = Rotate3DTransform(img_size=16)
    x = _imgs(1, 16)
    target, mask = t.get_target_np(x, 90)
    assert target.shape == x.shape
    assert mask.mean() < 1.0


def test_get_task_routes_geometric():
    assert isinstance(get_task("zoom"), ZoomTransform)
    assert isinstance(get_task("shiftx"), ShiftXTransform)
    with pytest.raises(KeyError):
        get_task("nonsense")


def test_lerp_slerp_shapes():
    a = np.random.RandomState(0).randn(3, 8)
    b = np.random.RandomState(1).randn(3, 8)
    assert lerp(a, b, 5).shape == (5, 3, 8)
    assert slerp(a, b, 5).shape == (5, 3, 8)


def test_dsprites_composite_sliders():
    from latent2im_tpu.tasks.transforms import DspritesTransform

    t = DspritesTransform()
    rng = np.random.RandomState(0)
    slider, vals = t.train_alpha_np(rng, 3, attr_list=["scale", "x", "posx", "posy"])
    # scale(1) + x(2) + posx(1) + posy(1) = 5 sliders
    assert slider.shape == (3, 5)
    assert vals.shape == (5,)
    assert any(abs(float(vals[0]) - s) < 1e-6 for s in t.SCALE_LADDER)
    assert 0 <= vals[3] <= 1 and 0 <= vals[4] <= 1


def test_dsprites_device_sampler_matches_np_composition():
    """The jitted trainer's device-side dsprites sampler must follow the
    reference composition (discrete scale ladder, two x sliders, posx/posy
    in [0,1]) — not the base U(-1,1)^n."""
    import jax

    from latent2im_tpu.tasks.transforms import DspritesTransform

    task = DspritesTransform()
    sliders = []
    for i in range(64):
        s, a = task.train_alpha(jax.random.PRNGKey(i), 3, 5)
        assert s.shape == (3, 5) and a.shape == (5,)
        sliders.append(np.asarray(a))
    arr = np.stack(sliders)
    ladder = np.asarray([0.5, 0.6, 0.7, 0.8, 0.9, 1.0], np.float32)
    assert np.all(np.min(np.abs(arr[:, 0, None] - ladder), axis=1) < 1e-6)
    assert arr[:, 1].min() < 0 < arr[:, 1].max()  # x sliders span [-1,1]
    assert arr[:, 3].min() >= 0 and arr[:, 4].min() >= 0  # pos in [0,1]
    # np sampler agrees on shape
    s_np, a_np = task.train_alpha_np(np.random.RandomState(0), 3)
    assert s_np.shape == (3, 5)
