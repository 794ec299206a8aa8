"""Generate the committed FULL-SCALE torch parity recordings.

Builds the inline rosinality torch oracle (tests/test_stylegan2_torch_oracle
.py) at (a) 256px with the REAL channel table and n_mlp=8 and (b) 1024px,
loads the deterministic numpy weights from tests/fullscale_ref.py with
``strict=True`` (a key/shape check against the rosinality layout,
reference graphs/stylegan_v2_real/networks.py:384-458), runs the TORCH
forward on fixed z with the stored noise buffers, and records the outputs.

Only the outputs are committed (weights rebuild from the seed on both
sides): ref_outputs_256px.npz (float32) and ref_outputs_1024px.npz
(float16 — 12MB instead of 25; the parity gates are ~1e-2 scale, far above
fp16 storage noise on [-1,1]-ish images).

Run once (outputs are committed):  python tests/fixtures/gen_fullscale.py
"""

import os
import sys
import time

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from fullscale_ref import CHANNELS, N_MLP, STYLE_DIM, fixture_z, np_state_dict
from test_stylegan2_torch_oracle import TGenerator

CASES = [
    # (size, n_z, store dtype)
    (256, 4, np.float32),
    (1024, 2, np.float16),
]


def main():
    torch.set_grad_enabled(False)
    for size, n, store_dtype in CASES:
        t0 = time.time()
        tg = TGenerator(size, STYLE_DIM, N_MLP, CHANNELS).eval()
        sd = {k: torch.from_numpy(v) for k, v in np_state_dict(size).items()}
        tg.load_state_dict(sd, strict=True)
        z = fixture_z(size, n)
        noise = [getattr(tg.noises, f"noise_{i}") for i in range(tg.num_layers)]
        imgs = tg(torch.from_numpy(z), noise).numpy()  # NCHW
        out = os.path.join(HERE, f"ref_outputs_{size}px.npz")
        np.savez_compressed(
            out,
            z=z,
            images=np.transpose(imgs, (0, 2, 3, 1)).astype(store_dtype),
        )
        print(f"{out}: {imgs.shape} range [{imgs.min():.3f}, {imgs.max():.3f}] "
              f"in {time.time() - t0:.0f}s, {os.path.getsize(out) / 1e6:.1f}MB")


if __name__ == "__main__":
    main()
