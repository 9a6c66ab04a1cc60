"""Test setup: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (shard_map over a Mesh) are exercised without TPU hardware — the
TPU-native substitute for a distributed test harness (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# the axon TPU plugin force-registers itself regardless of JAX_PLATFORMS;
# the config update below actually pins tests to the virtual-8-device CPU
jax.config.update("jax_platforms", "cpu")
# parity tests compare against torch fp32 — disable bf16 matmul passes
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib
import sys

import pytest

REFERENCE_PATH = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE_PATH.exists()


@pytest.fixture(scope="session")
def reference_path() -> pathlib.Path:
    """Path to the upstream PyTorch reference, used only for golden-value
    parity tests (importing its modules/weights, never copying them)."""
    if not has_reference():
        pytest.skip("reference repo not available")
    if str(REFERENCE_PATH) not in sys.path:
        sys.path.insert(0, str(REFERENCE_PATH))
    return REFERENCE_PATH


@pytest.fixture(scope="session")
def torch():
    return pytest.importorskip("torch")
