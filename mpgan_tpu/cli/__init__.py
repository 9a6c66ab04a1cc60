"""CLI entry points (train / train_mnist / gen)."""

from __future__ import annotations

import os


def pin_platform() -> None:
    """Honor a JAX_PLATFORMS env request in-process.

    The axon TPU plugin force-registers itself and initializes its backend
    even when ``JAX_PLATFORMS=cpu`` is exported — and that initialization
    blocks indefinitely when the TPU tunnel is unreachable. Mirroring the
    env var into ``jax.config`` before first device use actually pins the
    platform (tests/conftest.py applies the same fix for the test suite).
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)
