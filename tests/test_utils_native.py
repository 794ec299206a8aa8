"""utils/image + native extension parity tests."""

import os

import numpy as np
import pytest

from latent2im_tpu.utils import image as imgmod


def test_imgrid_numpy_semantics():
    batch = np.random.RandomState(0).randint(0, 255, (5, 6, 7, 3), np.uint8)
    grid = imgmod.imgrid(batch, cols=2, pad=1)
    # 3 rows x 2 cols, 1px seams trimmed at the outer edge
    assert grid.shape == (3 * 7 - 1, 2 * 8 - 1, 3)
    # top-left image lands verbatim
    np.testing.assert_array_equal(grid[:6, :7], batch[0])
    with pytest.raises(ValueError):
        imgmod.imgrid(batch.astype(np.float32))


def test_native_matches_numpy_imgrid():
    nat = pytest.importorskip("latent2im_tpu.native")
    batch = np.random.RandomState(1).randint(0, 255, (4, 5, 9, 3), np.uint8)
    got = nat._l2i_native.imgrid(batch, 3, 1)
    # numpy reference path
    n, h, w, c = batch.shape
    rows = 2
    a = np.pad(batch, [[0, rows * 3 - n], [0, 1], [0, 1], [0, 0]],
               constant_values=255)
    want = (
        a.reshape(rows, 3, h + 1, w + 1, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * (h + 1), 3 * (w + 1), c)[:-1, :-1]
    )
    np.testing.assert_array_equal(got, want)


def test_load_and_resize_image(tmp_path):
    import PIL.Image

    arr = np.random.RandomState(2).randint(0, 255, (20, 30, 3), np.uint8)
    p = str(tmp_path / "img.png")
    PIL.Image.fromarray(arr).save(p)
    out = imgmod.load_and_resize_image(p, 16)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8


def test_to_uint8():
    x = np.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_array_equal(imgmod.to_uint8(x), [0, 127, 255, 255])


def test_html_gallery(tmp_path):
    from latent2im_tpu.utils.html import make_html

    import PIL.Image

    for i in range(2):
        PIL.Image.fromarray(
            np.zeros((4, 4, 3), np.uint8)
        ).save(tmp_path / f"x{i}.png")
    path = make_html(str(tmp_path))
    html = open(path).read()
    assert "x0.png" in html and "x1.png" in html and "<table" in html


def test_real_batcher_dataset_smaller_than_batch(tmp_path):
    """--updateGAN's real-image batcher must make progress when the dataset
    is smaller than batch_size (ragged batches buffer across epochs)."""
    import PIL.Image

    from latent2im_tpu.cli.train import _make_real_batcher

    for i in range(3):
        arr = np.random.RandomState(i).randint(0, 255, (16, 16, 3), np.uint8)
        PIL.Image.fromarray(arr).save(tmp_path / f"im{i}.png")
    paths = sorted(str(p) for p in tmp_path.glob("*.png"))

    next_real = _make_real_batcher(paths, 16, 8)
    for _ in range(3):
        b = next_real()
        assert b.shape == (8, 16, 16, 3) and b.dtype == np.uint8
