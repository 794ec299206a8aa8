"""Shared test helpers."""

import numpy as np

import jax

ON_CPU = jax.default_backend() == "cpu"

# XLA:TPU computes f32 convs as bf16x3 passes (excess precision allowed), so
# numeric parity vs exact-f32 oracles is ~1e-3-scale there. CPU stays the
# strict parity gate; on TPU the same tests verify compile+run with loosened
# tolerances.
TPU_RTOL = 1.5e-2
TPU_ATOL = 1.5e-2


def assert_close(got, want, rtol=1e-5, atol=1e-5, tpu_rtol=None, tpu_atol=None):
    if not ON_CPU:
        rtol = max(rtol, tpu_rtol or TPU_RTOL)
        atol = max(atol, tpu_atol or TPU_ATOL)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=rtol, atol=atol)


def assert_images_close(got, want, rtol=2e-3, atol=2e-3,
                        tpu_rel_l2=0.02, tpu_max_abs_frac=0.02):
    """Image-tensor parity: strict elementwise on CPU; on TPU a scale-aware
    gate (relative L2 + max-abs as a fraction of the image scale) — deep
    random-weight generators cross zero everywhere, so elementwise rtol
    explodes on bf16x3 conv outputs that are globally within ~1%."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    if ON_CPU:
        np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)
        return
    rel_l2 = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
    scale = np.abs(want).max() + 1e-12
    max_abs = np.abs(got - want).max()
    assert rel_l2 < tpu_rel_l2, f"relative L2 {rel_l2:.4f} >= {tpu_rel_l2}"
    assert max_abs < tpu_max_abs_frac * scale, (
        f"max abs {max_abs:.4f} >= {tpu_max_abs_frac} * scale {scale:.3f}"
    )
