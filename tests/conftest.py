"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Hard override: the environment presets JAX_PLATFORMS=axon (TPU tunnel),
# and the axon plugin ignores the env var — the jax.config update below is
# what actually pins tests to the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
