"""Test configuration: run on a virtual 8-device CPU mesh by default.

The container's sitecustomize imports jax and registers the axon TPU backend
before pytest starts, so JAX_PLATFORMS is snapshotted too early for env vars;
switch platforms via jax.config instead. XLA_FLAGS is still read lazily at CPU
backend init, so the host-device-count flag works from here.

Set L2I_TEST_TPU=1 to run the suite against the real TPU chip instead.
"""

import os

if os.environ.get("L2I_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running end-to-end test (still part of the default run)",
    )
