"""Geometric / color transforms with pixel-space targets + masks.

Re-creates the GAN-steerability lineage of the reference
(utils/transforms.py:8-614): each task supplies `get_train_alpha`,
`scale_test_alpha_for_graph`, test/vis schedules AND `get_target_np` — a
pixel-space ground-truth target plus binary mask consumed by the masked-L2
edit loss (engine.losses.masked_l2). Target generation is host-side
numpy/cv2 exactly like the reference (these paths are data preparation, not
device compute). Layout is NHWC throughout (the reference transposes NCHW
in/out; we never leave NHWC).

skimage is not in this image, so Lab conversion is implemented directly
(sRGB D65, matching skimage.color.rgb2lab/lab2rgb semantics).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from . import warp as warplib
from .transforms import Task

# ---------------------------------------------------------------------------
# colorspace helpers (skimage-compatible rgb<->lab, D65)
# ---------------------------------------------------------------------------

_M_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]]
)
_WHITE = np.array([0.95047, 1.0, 1.08883])


def rgb2lab(rgb: np.ndarray) -> np.ndarray:
    """rgb in [0,1] (H,W,3) -> Lab."""
    rgb = np.clip(rgb, 0, 1)
    lin = np.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    xyz = lin @ _M_RGB2XYZ.T / _WHITE

    def f(t):
        return np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xyz[..., 0]), f(xyz[..., 1]), f(xyz[..., 2])
    return np.stack([116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], -1)


def lab2rgb(lab: np.ndarray) -> np.ndarray:
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        return np.where(t**3 > 0.008856, t**3, (t - 16.0 / 116.0) / 7.787)

    xyz = np.stack([finv(fx), finv(fy), finv(fz)], -1) * _WHITE
    lin = xyz @ np.linalg.inv(_M_RGB2XYZ).T
    rgb = np.where(lin > 0.0031308, 1.055 * np.clip(lin, 0, None) ** (1 / 2.4) - 0.055,
                   12.92 * lin)
    return np.clip(rgb, 0, 1)


def _full_box(size: int) -> np.ndarray:
    return np.array([0, 0, size - 1, size - 1], np.float32)


def _id_payload(size: int) -> dict:
    return {"minv": np.eye(3, dtype=np.float32), "box": _full_box(size)}


def _binarize(mask: np.ndarray) -> np.ndarray:
    mask[np.nonzero(mask)] = 1.0
    assert np.setdiff1d(mask, [0.0, 1.0]).size == 0
    return mask


# ---------------------------------------------------------------------------
# 3D rotation (utils/rotate3d.py:46-119)
# ---------------------------------------------------------------------------


class ImageTransformer:
    """Perspective rotation of an (H, W, C) image about x/y/z axes."""

    def __init__(self, image_np: np.ndarray, shape=None):
        self.image = image_np
        self.height, self.width = image_np.shape[:2]
        self.num_channels = image_np.shape[2]

    def rotate_along_axis(self, theta=0, phi=0, gamma=0, dx=0, dy=0, dz=0):
        rt, rp, rg = np.deg2rad([theta, phi, gamma])
        d = np.sqrt(self.height**2 + self.width**2)
        self.focal = d / (2 * np.sin(rg) if np.sin(rg) != 0 else 1)
        dz = self.focal
        mat = self._get_m(rt, rp, rg, dx, dy, dz)
        return cv2.warpPerspective(self.image.copy(), mat, (self.width, self.height))

    def _get_m(self, theta, phi, gamma, dx, dy, dz):
        w, h, f = self.width, self.height, self.focal
        a1 = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1], [0, 0, 1]])
        rx = np.array([[1, 0, 0, 0], [0, np.cos(theta), -np.sin(theta), 0],
                       [0, np.sin(theta), np.cos(theta), 0], [0, 0, 0, 1]])
        ry = np.array([[np.cos(phi), 0, -np.sin(phi), 0], [0, 1, 0, 0],
                       [np.sin(phi), 0, np.cos(phi), 0], [0, 0, 0, 1]])
        rz = np.array([[np.cos(gamma), -np.sin(gamma), 0, 0],
                       [np.sin(gamma), np.cos(gamma), 0, 0],
                       [0, 0, 1, 0], [0, 0, 0, 1]])
        t = np.array([[1, 0, 0, dx], [0, 1, 0, dy], [0, 0, 1, dz], [0, 0, 0, 1]])
        a2 = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0]])
        return a2 @ t @ rx @ ry @ rz @ a1


# ---------------------------------------------------------------------------
# tasks
# ---------------------------------------------------------------------------


class ColorTransform(Task):
    """Channel-wise additive color shift (transforms.py:8-78)."""

    num_channels = 3

    def __init__(self, walk_type="linear", nsliders=3, channel=None):
        super().__init__(walk_type, nsliders)
        self.channel = channel

    def get_target_np(self, outputs_zs, alpha):
        mask_out = np.ones(outputs_zs.shape)
        if not np.any(alpha):
            return outputs_zs, mask_out
        target = np.copy(outputs_zs)
        for b in range(alpha.shape[0]):
            for i in range(self.num_channels):
                target[b, :, :, i] += alpha[b, i]
        return target, mask_out

    def device_spec(self, alpha, img_size):
        """In-graph target: per-sample channel shift (tasks/warp.py)."""
        return ("color", np.asarray(alpha, np.float32), False)

    def train_alpha_np(self, rng, batch, n_attr=None):
        if self.channel is None:
            a = rng.random_sample((batch, self.num_channels)) - 0.5
        else:
            a = np.zeros((batch, self.num_channels))
            a[:, self.channel] = rng.random_sample(batch) - 0.5
        return a.astype(np.float32), a.astype(np.float32)

    def scale_test_alpha(self, alpha, batch, n_sliders=None, contrast=False):
        if self.channel is None:
            return alpha * np.ones((batch, self.num_channels), np.float32)
        slider = (
            -alpha * np.ones((batch, self.nsliders), np.float32)
            if contrast
            else np.zeros((batch, self.nsliders), np.float32)
        )
        slider[:, self.channel] = alpha
        return slider

    def test_alphas(self):
        return np.linspace(-1, 1, 9)

    def vis_alphas(self, num_panels):
        return np.linspace(0, 1, num_panels)


class ColorLabTransform(ColorTransform):
    """Lab-space color shifts; alpha in [-1,1] scales to L/a/b ranges
    (transforms.py:80-131)."""

    def device_spec(self, alpha, img_size):
        return ("colorlab", np.asarray(alpha, np.float32), False)

    def get_target_np(self, outputs_zs, alpha):
        mask_out = np.ones(outputs_zs.shape)
        if not np.any(alpha):
            return outputs_zs, mask_out
        target = np.copy(outputs_zs)
        scaled = np.copy(alpha).astype(np.float64)
        scaled[:, 0] *= 50.0
        scaled[:, 1] *= 128.0
        scaled[:, 2] *= 128.0
        for b in range(alpha.shape[0]):
            lab = rgb2lab((target[b] + 1) / 2)
            for i in range(self.num_channels):
                lab[:, :, i] += scaled[b, i]
            target[b] = lab2rgb(lab) * 2 - 1
        return target, mask_out


class ZoomTransform(Task):
    """log-alpha slider; crop/pad + resize target with validity mask
    (transforms.py:133-284)."""

    num_panel = 15  # trainEmbed ladder (transforms.py:138-142)

    def __init__(self, walk_type="linear", nsliders=1, img_size=256):
        super().__init__(walk_type, nsliders)
        self.img_size = img_size

    def embedding_alphas(self):
        # geometric ladder in zoom factor space (transforms.py:142)
        return np.exp(np.linspace(np.log(0.5), np.log(2), self.num_panel))

    def train_alpha_embed_np(self, rng, batch, n_attr=None):
        # zoom's trainEmbed slider is log(alpha), unscaled (transforms.py:
        # 211-222)
        index = int(rng.choice(self.num_panel))
        alpha_val = float(self.embedding_alphas()[index])
        slider = np.full((batch, self.nsliders), np.log(alpha_val), np.float32)
        return slider, np.float32(alpha_val), index

    def device_spec(self, alpha, img_size):
        """Crop/pad+resize as one dst->src affine (tasks/warp.py:zoom_minv);
        clamp (edge replicate, clipped to the crop box) on the zoom-in
        branch = cv2.resize border semantics."""
        if alpha == 1:
            return ("warp", _id_payload(img_size), True)
        minv, clamp, box = warplib.zoom_minv(float(alpha), img_size)
        return ("warp", {"minv": minv, "box": box}, clamp)

    def get_target_np(self, outputs_zs, alpha):
        img_size = outputs_zs.shape[1]
        mask_fn = np.ones(outputs_zs.shape)
        if alpha == 1:
            return outputs_zs, mask_fn
        new_size = int(alpha * img_size)
        if alpha < 1:  # crop -> zoom in
            lo = img_size // 2 - new_size // 2
            hi = img_size // 2 + new_size // 2
            cropped = outputs_zs[:, lo:hi, lo:hi, :]
            mask_cropped = mask_fn
        else:  # pad -> zoom out
            cropped = np.zeros(
                (outputs_zs.shape[0], new_size, new_size, outputs_zs.shape[3])
            )
            mask_cropped = np.zeros_like(cropped)
            lo = new_size // 2 - img_size // 2
            hi = new_size // 2 + img_size // 2
            cropped[:, lo:hi, lo:hi, :] = outputs_zs
            mask_cropped[:, lo:hi, lo:hi, :] = mask_fn
        target = np.zeros(outputs_zs.shape)
        mask_out = np.zeros(outputs_zs.shape)
        for i in range(outputs_zs.shape[0]):
            target[i] = np.atleast_3d(
                cv2.resize(cropped[i], (img_size, img_size),
                           interpolation=cv2.INTER_LINEAR)
            )
            mask_out[i] = np.atleast_3d(
                cv2.resize(mask_cropped[i], (img_size, img_size),
                           interpolation=cv2.INTER_LINEAR)
            )
        return target, _binarize(mask_out)

    def train_alpha_np(self, rng, batch, n_attr=None):
        coin = rng.uniform(0, 1)
        alpha_val = rng.uniform(0.5, 1.0) if coin <= 0.5 else rng.uniform(1.0, 2.0)
        slider = np.ones((batch, self.nsliders), np.float32) * np.log(alpha_val)
        return slider, alpha_val

    def scale_test_alpha(self, alpha, batch, n_sliders=None):
        return np.log(alpha) * np.ones((batch, self.nsliders), np.float32)

    def test_alphas(self):
        return np.array([0.0625, 0.083, 0.125, 0.25, 0.5, 0.8, 1, 1.2, 2, 4, 8, 12, 16])

    def vis_alphas(self, num_panels):
        alp = np.linspace(1, 8, num_panels // 2 + 1)
        b = 1 / alp
        return np.concatenate((np.delete(b[::-1], -1), alp))[::-1]


class ShiftTransform(Task):
    """Pixel shifts via affine warp (transforms.py:286-438)."""

    axis = "x"
    alpha_max = 8
    num_panel = 15          # trainEmbed ladder (transforms.py:296-301)
    embed_alpha_max = 7.0

    def __init__(self, walk_type="linear", nsliders=1, img_size=256):
        super().__init__(walk_type, nsliders)
        self.img_size = img_size

    def embedding_alphas(self):
        return np.linspace(-self.embed_alpha_max, self.embed_alpha_max,
                           self.num_panel)

    def device_spec(self, alpha, img_size):
        return ("warp", {"minv": warplib.shift_minv(float(alpha), self.axis),
                         "box": _full_box(img_size)}, False)

    def get_target_np(self, outputs_zs, alpha):
        img_size = outputs_zs.shape[1]
        mask_fn = np.ones(outputs_zs.shape)
        if alpha == 0:
            return outputs_zs, mask_fn
        if self.axis == "x":
            m = np.float32([[1, 0, alpha], [0, 1, 0]])
        else:
            m = np.float32([[1, 0, 0], [0, 1, alpha]])
        target = np.zeros(outputs_zs.shape)
        mask_out = np.zeros(outputs_zs.shape)
        for i in range(outputs_zs.shape[0]):
            target[i] = np.atleast_3d(
                cv2.warpAffine(outputs_zs[i], m, (img_size, img_size))
            )
            mask_out[i] = np.atleast_3d(
                cv2.warpAffine(mask_fn[i], m, (img_size, img_size))
            )
        return target, _binarize(mask_out)

    def train_alpha_np(self, rng, batch, n_attr=None):
        alpha_val = rng.randint(-self.alpha_max, self.alpha_max)
        slider = np.ones((batch, self.nsliders), np.float32) * (
            alpha_val / self.alpha_max
        )
        return slider, alpha_val

    def scale_test_alpha(self, alpha, batch, n_sliders=None):
        return (alpha / self.alpha_max) * np.ones((batch, self.nsliders), np.float32)

    def test_alphas(self):
        return np.array([-200, -150, -100, -50, 0, 50, 100, 150, 200])

    def vis_alphas(self, num_panels):
        return np.linspace(-400, 400, num_panels)


class ShiftXTransform(ShiftTransform):
    axis = "x"


class ShiftYTransform(ShiftTransform):
    axis = "y"


class Rotate2DTransform(Task):
    """In-plane rotation (transforms.py:440-547)."""

    alpha_max = 45
    num_panel = 15           # trainEmbed ladder (transforms.py:445-451)
    embed_alpha_max = 45.0

    def __init__(self, walk_type="linear", nsliders=1, img_size=256):
        super().__init__(walk_type, nsliders)
        self.img_size = img_size

    def embedding_alphas(self):
        return np.linspace(-self.embed_alpha_max, self.embed_alpha_max,
                           self.num_panel)

    def device_spec(self, alpha, img_size):
        return ("warp", {"minv": warplib.rotate2d_minv(float(alpha), img_size),
                         "box": _full_box(img_size)}, False)

    def get_target_np(self, outputs_zs, alpha):
        img_size = outputs_zs.shape[1]
        mask_fn = np.ones(outputs_zs.shape)
        if alpha == 0:
            return outputs_zs, mask_fn
        m = cv2.getRotationMatrix2D((img_size // 2, img_size // 2), alpha, 1)
        target = np.zeros(outputs_zs.shape)
        mask_out = np.zeros(outputs_zs.shape)
        for i in range(outputs_zs.shape[0]):
            target[i] = np.atleast_3d(
                cv2.warpAffine(outputs_zs[i], m, (img_size, img_size))
            )
            mask_out[i] = np.atleast_3d(
                cv2.warpAffine(mask_fn[i], m, (img_size, img_size))
            )
        return target, _binarize(mask_out)

    def train_alpha_np(self, rng, batch, n_attr=None):
        alpha_val = rng.randint(-self.alpha_max, self.alpha_max)
        slider = np.ones((batch, self.nsliders), np.float32) * (
            alpha_val / self.alpha_max
        )
        return slider, alpha_val

    def scale_test_alpha(self, alpha, batch, n_sliders=None):
        return (alpha / self.alpha_max) * np.ones((batch, self.nsliders), np.float32)

    def test_alphas(self):
        return np.linspace(-90, 90, 9)

    def vis_alphas(self, num_panels):
        return np.linspace(-90, 90, num_panels)


class Rotate3DTransform(Rotate2DTransform):
    """Out-of-plane (perspective) rotation about the y axis
    (transforms.py:549-614)."""

    alpha_max = 720

    def device_spec(self, alpha, img_size):
        if alpha == 0:
            return ("warp", _id_payload(img_size), True)
        return ("warp",
                {"minv": warplib.rotate3d_minv(float(alpha), img_size, dx=5.0),
                 "box": _full_box(img_size)}, False)

    def get_target_np(self, outputs_zs, alpha):
        mask_fn = np.ones(outputs_zs.shape)
        if alpha == 0:
            return outputs_zs, mask_fn
        target = np.zeros(outputs_zs.shape)
        mask_out = np.zeros(outputs_zs.shape)
        for i in range(outputs_zs.shape[0]):
            it = ImageTransformer(outputs_zs[i], None)
            target[i] = np.atleast_3d(it.rotate_along_axis(phi=alpha, dx=5))
            itm = ImageTransformer(mask_fn[i], None)
            mask_out[i] = np.atleast_3d(itm.rotate_along_axis(phi=alpha, dx=5))
        return target, _binarize(mask_out)

    def test_alphas(self):
        return np.linspace(-720, 720, 9)

    def vis_alphas(self, num_panels):
        return np.linspace(-720, 720, num_panels)


GEOMETRIC_TASKS = {
    "color": ColorTransform,
    "colorlab": ColorLabTransform,
    "zoom": ZoomTransform,
    "shiftx": ShiftXTransform,
    "shifty": ShiftYTransform,
    "rotate2d": Rotate2DTransform,
    "rotate3d": Rotate3DTransform,
}
