"""Image grid assembly and saving.

Same output surface as the reference's utils/image.py (imgrid tiling with
1px white padding, PNG save), NHWC uint8. A native C++ fast path for grid
assembly is used when the extension is built (native/); numpy otherwise.
"""

from __future__ import annotations

import numpy as np
import PIL.Image


def imgrid(imarray: np.ndarray, cols: int = 5, pad: int = 1) -> np.ndarray:
    """Tile [N, H, W, C] uint8 images into a grid with `pad`px white seams."""
    if imarray.dtype != np.uint8:
        raise ValueError("imgrid input imarray must be uint8")
    pad = int(pad)
    cols = int(cols)
    assert pad >= 0 and cols >= 1
    n, h, w, c = imarray.shape
    rows = int(np.ceil(n / float(cols)))

    try:
        from latent2im_tpu.native import _l2i_native  # type: ignore

        return _l2i_native.imgrid(np.ascontiguousarray(imarray), cols, pad)
    except ImportError:
        pass

    batch_pad = rows * cols - n
    imarray = np.pad(
        imarray,
        [[0, batch_pad], [0, pad], [0, pad], [0, 0]],
        "constant",
        constant_values=255,
    )
    hp, wp = h + pad, w + pad
    grid = (
        imarray.reshape(rows, cols, hp, wp, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * hp, cols * wp, c)
    )
    if pad:
        grid = grid[:-pad, :-pad]
    return np.squeeze(grid)


def save_im(a: np.ndarray, filename: str, format: str = "png") -> None:
    """Save a uint8 array as `{filename}.{format}`."""
    a = np.asarray(a, dtype=np.uint8)
    im = PIL.Image.fromarray(np.squeeze(a))
    im.save(f"{filename}.{format}")


def to_uint8(ims) -> np.ndarray:
    """[-1,1] float images -> uint8 (the reference's clip_ims). Idempotent:
    already-uint8 input (e.g. Editor.sweep(u8=True)'s in-graph conversion,
    which uses these exact clip+truncate semantics) passes through."""
    ims = np.asarray(ims)
    if ims.dtype == np.uint8:
        return ims
    return np.uint8(np.clip(((ims + 1) / 2.0) * 255, 0, 255))


def load_and_resize_image(path: str, size: int = 256) -> np.ndarray:
    """Load an image file, center-square-crop, resize -> uint8 [size,size,3]
    (the reference's load_and_resize_imagenet_image, utils/image.py:68-85,
    with deterministic center cropping). Native decode when built."""
    try:
        from latent2im_tpu.native import _l2i_native  # type: ignore

        return _l2i_native.load_resize(path, size)
    except ImportError:
        pass
    import PIL.Image

    im = PIL.Image.open(path).convert("RGB")
    w, h = im.size
    dim = min(w, h)
    im = im.crop(((w - dim) // 2, (h - dim) // 2,
                  (w - dim) // 2 + dim, (h - dim) // 2 + dim))
    return np.asarray(im.resize((size, size), PIL.Image.BILINEAR), np.uint8)
