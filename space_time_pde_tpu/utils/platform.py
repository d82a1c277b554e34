"""Platform selection helper.

In this environment jax is pre-imported at interpreter startup (a
sitecustomize hook registers the TPU PJRT plugin and programmatically
sets ``jax_platforms``), so ``JAX_PLATFORMS`` env vars are ignored.
Drivers call :func:`maybe_force_platform` first thing: set
``STPDE_PLATFORM=cpu`` (optionally ``STPDE_CPU_DEVICES=8``) to run any
CLI on the host CPU (smoke tests, debugging).
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_force_platform"]


def maybe_force_platform() -> None:
    plat = os.environ.get("STPDE_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
        if plat == "cpu":
            n = int(os.environ.get("STPDE_CPU_DEVICES", "1"))
            try:
                jax.config.update("jax_num_cpu_devices", n)
            except RuntimeError:
                # Backends already initialized (e.g. a driver imported
                # from a test process whose conftest configured jax
                # first). Keep the existing device count rather than
                # crashing the import — the platform choice above is
                # what callers depend on.
                import warnings
                warnings.warn(
                    "STPDE_CPU_DEVICES ignored: jax backends already "
                    "initialized", RuntimeWarning, stacklevel=2)
