"""Device-side geometric targets: batched homography warps in-graph.

The reference computes geometric training targets on the host with cv2
(utils/transforms.py:133-614: warpAffine / warpPerspective / resize, all
INTER_LINEAR) — which forces its training loop through a device->host->device
round-trip per step. Every one of those targets is an affine or projective
resample, so here they run ON the TPU: one bilinear homography sampler
covers shift/rotate2d/zoom/rotate3d, the tasks provide host-computed 3x3
dst->src matrices (cheap scalar math reproducing cv2's matrix conventions,
including warpAffine/warpPerspective's internal matrix inversion), and the
masked-L2 step becomes a single jitted, mesh-shardable program with zero
host warps.

Parity with the cv2 path is bounded by cv2's fixed-point interpolation
(INTER_BITS=5: coordinates and weights quantized to 1/32) — the float
sampler here is the *exact* bilinear map, so agreement is ~1e-2 at unit
image scale on smooth images, and binarized masks can differ on borderline
edge pixels (tested in tests/test_warp_device.py with stated gates).

Layout NHWC; matrices use cv2's (x, y) coordinate convention.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def warp_perspective(imgs: jnp.ndarray, minv, clamp: bool = False, box=None):
    """Bilinear projective resample of NHWC `imgs`.

    minv: [3,3] (shared) or [B,3,3] dst->src homography in pixel coordinates,
    (x, y) convention — i.e. the INVERSE of the matrix cv2.warpAffine /
    cv2.warpPerspective take (those invert internally unless
    WARP_INVERSE_MAP). clamp=False: zero border (BORDER_CONSTANT 0);
    clamp=True: edge replicate — cv2.resize's behavior at array edges —
    with coordinates clipped into `box` = [x0, y0, x1, y1] when given: the
    zoom-in path resizes a CROP, so cv2 replicates at the crop boundary,
    not the full-image boundary.
    """
    b, h, w, _ = imgs.shape
    minv = jnp.asarray(minv, jnp.float32)
    if minv.ndim == 2:
        minv = jnp.broadcast_to(minv[None], (b, 3, 3))
    ys, xs = jnp.mgrid[0:h, 0:w].astype(jnp.float32)
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=0).reshape(3, h * w)  # [3, HW]
    src = jnp.einsum("bij,jn->bin", minv, dst)                 # [B, 3, HW]
    sx = src[:, 0] / src[:, 2]
    sy = src[:, 1] / src[:, 2]
    if clamp and box is not None:
        box = jnp.asarray(box, jnp.float32)
        sx = jnp.clip(sx, box[0], box[2])
        sy = jnp.clip(sy, box[1], box[3])
    coords_hw = jnp.stack([sy, sx], axis=1).reshape(b, 2, h, w)
    mode = "nearest" if clamp else "constant"

    def one(img, coords):  # img [H,W,C]
        return jax.vmap(
            lambda ch: jax.scipy.ndimage.map_coordinates(
                ch, list(coords), order=1, mode=mode, cval=0.0
            ),
            in_axes=2, out_axes=2,
        )(img)

    return jax.vmap(one)(imgs, coords_hw)


def warp_target_and_mask(imgs: jnp.ndarray, minv, clamp: bool = False,
                         box=None):
    """(warped target, binarized validity mask) — the get_target_np contract
    (utils/transforms.py _binarize: any nonzero -> 1) on device. With
    clamp=True every output pixel is valid (cv2.resize has no border), so the
    mask is all-ones, matching the reference's zoom-in branch."""
    target = warp_perspective(imgs, minv, clamp=clamp, box=box)
    if clamp:
        return target, jnp.ones_like(target)
    ones = jnp.ones_like(imgs)
    m = warp_perspective(ones, minv, clamp=False)
    return target, (m > 0).astype(imgs.dtype)


# ---------------------------------------------------------------------------
# host-side cv2-convention matrix builders (scalar math only)
# ---------------------------------------------------------------------------


def _inv3(m: np.ndarray) -> np.ndarray:
    return np.linalg.inv(np.asarray(m, np.float64)).astype(np.float32)


def shift_minv(alpha: float, axis: str) -> np.ndarray:
    """cv2.warpAffine([[1,0,ax],[0,1,ay]]) dst->src inverse
    (transforms.py:322-340)."""
    ax, ay = (alpha, 0.0) if axis == "x" else (0.0, alpha)
    return np.array(
        [[1, 0, -ax], [0, 1, -ay], [0, 0, 1]], np.float32
    )


def rotate2d_minv(alpha_deg: float, size: int) -> np.ndarray:
    """cv2.getRotationMatrix2D((size//2, size//2), alpha, 1) inverted
    (transforms.py:510-523)."""
    a = np.deg2rad(alpha_deg)
    ca, sa = np.cos(a), np.sin(a)
    cx = cy = size // 2
    m = np.array(
        [
            [ca, sa, (1 - ca) * cx - sa * cy],
            [-sa, ca, sa * cx + (1 - ca) * cy],
            [0, 0, 1],
        ]
    )
    return _inv3(m)


def zoom_minv(alpha: float, size: int) -> tuple[np.ndarray, bool, np.ndarray]:
    """The crop/pad + cv2.resize zoom (transforms.py:156-206) as one dst->src
    affine; returns (minv, clamp, box). cv2.resize maps src=(dst+0.5)*s-0.5
    (half-pixel centers) and replicates at ARRAY edges — for the
    crop+upsample (alpha<1) branch the array is the crop, so clamp=True with
    box clipping coordinates to the crop window [lo, hi-1]; the pad branch
    samples a zero-padded plane, identical to a zero border in
    original-image coordinates."""
    new_size = int(alpha * size)
    if alpha < 1:  # crop [lo:hi], upsample; crop length is 2*(ns//2)
        lo = size // 2 - new_size // 2
        hi = size // 2 + new_size // 2
        s = (hi - lo) / size
        off = lo + 0.5 * s - 0.5
        clamp = True
        box = np.array([lo, lo, hi - 1, hi - 1], np.float32)
    else:  # zero-pad to new_size, downsample
        lo = new_size // 2 - size // 2
        s = new_size / size
        off = 0.5 * s - 0.5 - lo
        clamp = False
        box = np.array([0, 0, size - 1, size - 1], np.float32)
    return (
        np.array([[s, 0, off], [0, s, off], [0, 0, 1]], np.float32),
        clamp,
        box,
    )


def rotate3d_minv(phi_deg: float, size: int, dx: float = 5.0) -> np.ndarray:
    """The ImageTransformer perspective matrix (utils/rotate3d.py:46-119,
    geometric.ImageTransformer) about the y axis, inverted for dst->src
    sampling (cv2.warpPerspective inverts internally)."""
    rp = np.deg2rad(phi_deg)
    w = h = size
    d = np.sqrt(h * h + w * w)
    f = d / 1.0  # gamma=0 -> focal = d / 1
    dz = f
    a1 = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1], [0, 0, 1]])
    ry = np.array(
        [
            [np.cos(rp), 0, -np.sin(rp), 0],
            [0, 1, 0, 0],
            [np.sin(rp), 0, np.cos(rp), 0],
            [0, 0, 0, 1],
        ]
    )
    t = np.array([[1, 0, 0, dx], [0, 1, 0, 0], [0, 0, 1, dz], [0, 0, 0, 1]])
    a2 = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0]])
    m = a2 @ t @ ry @ a1
    return _inv3(m)


# ---------------------------------------------------------------------------
# device color targets (transforms.py:8-131)
# ---------------------------------------------------------------------------

_M_RGB2XYZ = jnp.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227]
    ],
    jnp.float32,
)
_WHITE = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)


def rgb2lab_dev(rgb):
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    xyz = lin @ _M_RGB2XYZ.T / _WHITE
    f = jnp.where(xyz > 0.008856, jnp.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    return jnp.stack(
        [116.0 * fy - 16.0, 500.0 * (fx - fy), 200.0 * (fy - fz)], -1
    )


def lab2rgb_dev(lab):
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    f = jnp.stack([fx, fy, fz], -1)
    xyz = jnp.where(f**3 > 0.008856, f**3, (f - 16.0 / 116.0) / 7.787) * _WHITE
    lin = xyz @ jnp.linalg.inv(_M_RGB2XYZ).T
    rgb = jnp.where(
        lin > 0.0031308,
        1.055 * jnp.clip(lin, 0.0, None) ** (1 / 2.4) - 0.055,
        12.92 * lin,
    )
    return jnp.clip(rgb, 0.0, 1.0)


def color_target(imgs, alpha):
    """imgs [B,H,W,3] + per-sample channel shift alpha [B,3]
    (transforms.py:30-44)."""
    return imgs + alpha[:, None, None, :], jnp.ones_like(imgs)


def colorlab_target(imgs, alpha):
    """Lab-space shift: alpha [B,3] in [-1,1] scaled to L/a/b ranges
    (transforms.py:95-114)."""
    scale = jnp.array([50.0, 128.0, 128.0], jnp.float32)
    lab = rgb2lab_dev((imgs + 1.0) / 2.0) + (alpha * scale)[:, None, None, :]
    return lab2rgb_dev(lab) * 2.0 - 1.0, jnp.ones_like(imgs)
