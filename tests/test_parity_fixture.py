"""Committed torch-side parity fixtures: conversion fidelity pinned in CI.

tests/fixtures/ref_g_tiny.pt is a tiny rosinality-layout generator checkpoint
({'g_ema': state_dict}) and ref_outputs_tiny.npz holds the TORCH forward's
outputs on fixed seeds (generated once by fixtures/gen_fixture.py). These
tests run WITHOUT torch: convert the .pt, synthesize, and require the
recorded images back — any regression in the converter or the generator math
breaks them. The second test drives the cli.parity_check record/compare flow
end to end on the same fixture (the BASELINE.json quality-parity harness).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import assert_images_close
from latent2im_tpu.models import stylegan2 as sg2

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
G_PATH = os.path.join(FIXDIR, "ref_g_tiny.pt")
NPZ_PATH = os.path.join(FIXDIR, "ref_outputs_tiny.npz")


def test_converted_generator_reproduces_torch_recording():
    torch = pytest.importorskip("torch")  # .pt deserialization needs torch
    from latent2im_tpu.io import torch_convert as tc

    sd = torch.load(G_PATH, map_location="cpu", weights_only=False)["g_ema"]
    params = tc.convert_stylegan2_generator(sd, size=32)
    ref = np.load(NPZ_PATH)
    got = sg2.generator_forward(params, jnp.asarray(ref["z"]))
    assert_images_close(got, ref["images"])


def test_parity_check_cli_compare_against_fixture(tmp_path):
    pytest.importorskip("torch")
    from latent2im_tpu.cli import parity_check as pc

    report = pc.main([
        "compare", "--ref", NPZ_PATH, "--g_path", G_PATH,
        "--resolution", "32", "--n", "8", "--seed", "0",
    ])
    from helpers import ON_CPU

    # TPU f32 convs run as bf16x3 passes — looser absolute gates there
    pix, psnr, vggd = (5e-3, 55.0, 1e-4) if ON_CPU else (5e-2, 35.0, 1e-2)
    assert report["max_abs_pixel_diff"] < pix
    assert report["psnr_db"] > psnr
    assert report["vgg_feature_distance"] < vggd
