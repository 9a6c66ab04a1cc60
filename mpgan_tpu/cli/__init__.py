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
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache for every CLI/script process.

    The axon tunnel compiles on a remote server at ~30-60 s/program and
    nothing persists across processes without this (bench.py measured one
    warm line at 149 s -> 76 s). Training runs benefit most: the in-eval
    jitted programs (scanned sampler, EFP bases) compile once per machine
    instead of once per process. ``MPGAN_TPU_NO_COMP_CACHE=1`` disables
    (e.g. for compile-time measurements)."""
    if os.environ.get("MPGAN_TPU_NO_COMP_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
