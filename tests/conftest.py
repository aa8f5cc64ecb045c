"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding paths are exercised without TPU hardware.

Set RTGRFF_TPU_TESTS=1 to flip the suite into hardware mode instead: the
platform is left alone (real TPU), only tests marked `tpu` run, and the
CPU-mesh tests are skipped. Usage:

    RTGRFF_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q
"""

import os

import pytest

TPU_MODE = os.environ.get("RTGRFF_TPU_TESTS", "") == "1"

if not TPU_MODE:
    # Hard override: the environment presets JAX_PLATFORMS=axon (TPU
    # tunnel), and the axon plugin ignores the env var — the jax.config
    # update below is what actually pins tests to the virtual CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs real TPU hardware (run with RTGRFF_TPU_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    if TPU_MODE:
        skip = pytest.mark.skip(reason="hardware mode runs only tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs RTGRFF_TPU_TESTS=1 + real TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
