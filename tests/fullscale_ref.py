"""Deterministic full-scale rosinality state_dicts in pure numpy.

The full-scale parity fixtures (256px with the REAL channel table + n_mlp=8,
and 1024px) pin the converter and the production-only generator branches
(s2d FAST_TAIL at res>=512/ch<=64, the skip-upsample shift form at res>=128)
DIRECTLY against a torch forward — not against the repo's own standard path.
Committing a full-scale ``.pt`` would cost 100-200MB, so instead both sides
rebuild the weights from this seeded numpy builder and only the torch
OUTPUTS are committed (tests/fixtures/ref_outputs_{256,1024}px.npz, written
once by tests/fixtures/gen_fullscale.py which loads these arrays into the
inline torch oracle with ``strict=True`` — a shape/key check against the
rosinality layout, reference graphs/stylegan_v2_real/networks.py:384-458).

Values use realistic init scales (EqualLinear stores weight=randn/lr_mul,
modulation bias ~1, networks.py:135-156) so demodulation, the lr_mul=0.01
style baking, and the skip accumulation run at trained-network magnitudes.
"""

from __future__ import annotations

import numpy as np

STYLE_DIM = 512
N_MLP = 8

# rosinality channel table, channel_multiplier=2 (networks.py:389-400)
CHANNELS = {
    4: 512, 8: 512, 16: 512, 32: 512, 64: 512,
    128: 256, 256: 128, 512: 64, 1024: 32,
}


def np_state_dict(size: int, seed: int = 0) -> dict[str, np.ndarray]:
    """Full rosinality g_ema state_dict as float32 numpy arrays.

    Deterministic in (size, seed); key set and shapes match the inline torch
    oracle's ``TGenerator(size, 512, 8, CHANNELS).state_dict()`` exactly
    (asserted by gen_fullscale.py's strict load)."""
    rng = np.random.RandomState(seed)
    log_size = int(np.log2(size))
    num_layers = (log_size - 2) * 2 + 1
    sd: dict[str, np.ndarray] = {}

    def r(*shape, scale=1.0):
        return (scale * rng.randn(*shape)).astype(np.float32)

    for i in range(1, N_MLP + 1):
        # EqualLinear(lr_mul=0.01) stores weight = randn / lr_mul
        sd[f"style.{i}.weight"] = r(STYLE_DIM, STYLE_DIM, scale=100.0)
        sd[f"style.{i}.bias"] = r(STYLE_DIM, scale=0.1)
    sd["input.input"] = r(1, CHANNELS[4], 4, 4)

    def modconv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight"] = r(1, cout, cin, k, k)
        sd[f"{prefix}.conv.modulation.weight"] = r(cin, STYLE_DIM)
        sd[f"{prefix}.conv.modulation.bias"] = (
            1.0 + r(cin, scale=0.1)
        ).astype(np.float32)

    def styled(prefix, cin, cout):
        modconv(prefix, cin, cout, 3)
        sd[f"{prefix}.noise.weight"] = r(1, scale=0.3)
        sd[f"{prefix}.activate.bias"] = r(cout, scale=0.1)

    def to_rgb(prefix, cin):
        sd[f"{prefix}.bias"] = r(1, 3, 1, 1, scale=0.1)
        modconv(prefix, cin, 3, 1)

    styled("conv1", CHANNELS[4], CHANNELS[4])
    to_rgb("to_rgb1", CHANNELS[4])
    cin = CHANNELS[4]
    ci = 0
    for i in range(3, log_size + 1):
        cout = CHANNELS[2 ** i]
        styled(f"convs.{ci}", cin, cout)
        styled(f"convs.{ci + 1}", cout, cout)
        to_rgb(f"to_rgbs.{i - 3}", cout)
        cin = cout
        ci += 2
    for i in range(num_layers):
        res = 2 ** ((i + 5) // 2)
        sd[f"noises.noise_{i}"] = r(1, 1, res, res)
    return sd


def fixture_z(size: int, n: int, seed: int = 1) -> np.ndarray:
    return np.random.RandomState(seed + size).randn(n, STYLE_DIM).astype(
        np.float32
    )
