"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This is the standard way to test pjit/Mesh sharding without TPU hardware
(SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU tunnel registers itself via sitecustomize and force-sets
# jax_platforms="axon,cpu", overriding the env var — override it back so the
# test suite runs on the virtual 8-device CPU platform, not the single
# tunneled TPU chip.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

