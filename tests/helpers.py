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
