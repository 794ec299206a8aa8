"""Generate the committed torch-side parity fixtures.

Builds a tiny rosinality-layout torch StyleGAN2 generator (the inline oracle
from tests/test_stylegan2_torch_oracle.py), saves its checkpoint in the
reference's ``{'g_ema': state_dict}`` format, runs the TORCH forward on fixed
seeds with the stored noise buffers, and records the outputs. The committed
pair (ref_g_tiny.pt + ref_outputs_tiny.npz) lets CI pin PyTorch->JAX
conversion fidelity end to end with zero egress: tests convert the .pt and
must reproduce the .npz images.

Run once (outputs are committed):  python tests/fixtures/gen_fixture.py
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_stylegan2_torch_oracle import TGenerator  # noqa: E402

SIZE, STYLE_DIM, N_MLP = 32, 64, 2
CHANNELS = {4: 32, 8: 16, 16: 16, 32: 8}
N, SEED = 8, 0


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    torch.manual_seed(1234)
    tg = TGenerator(SIZE, STYLE_DIM, N_MLP, CHANNELS).eval()
    torch.save({"g_ema": tg.state_dict()}, os.path.join(here, "ref_g_tiny.pt"))

    z = np.random.RandomState(SEED).randn(N, STYLE_DIM).astype(np.float32)
    noise = [getattr(tg.noises, f"noise_{i}") for i in range(tg.num_layers)]
    with torch.no_grad():
        imgs = tg(torch.from_numpy(z), noise).numpy()  # NCHW
    np.savez(
        os.path.join(here, "ref_outputs_tiny.npz"),
        z=z,
        images=np.transpose(imgs, (0, 2, 3, 1)).astype(np.float32),  # NHWC
    )
    print("fixtures written:", os.listdir(here))


if __name__ == "__main__":
    main()
