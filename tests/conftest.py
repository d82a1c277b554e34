"""Test harness config: run on CPU with 8 virtual XLA devices.

NOTE: in this environment ``sitecustomize.py`` pre-imports jax and
registers the remote-TPU (axon) PJRT plugin at interpreter startup, so
setting ``JAX_PLATFORMS``/``XLA_FLAGS`` env vars here is too late.
Instead force the platform through ``jax.config`` before any backend is
initialized (conftest runs before any test module touches a device).

8 virtual CPU devices let the `shard_map` data-parallel step and the
sharded-latent-grid halo exchange be tested without a TPU pod slice —
the same code runs unchanged on real meshes.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The suite's wall time is dominated by XLA:CPU compiles of the big
# jet/shard_map train-step graphs (execution at these tiny shapes is
# milliseconds). Two measured facts drive the settings here:
#  - optimization level 0 cuts those compiles ~45% (9.7 s vs 16.3 s on
#    the dp_sp 4-D step) with identical test outcomes — the tests
#    assert numerics against oracles, not performance;
#  - the persistent compilation cache is USELESS for XLA:CPU in this
#    environment: entries are AOT artifacts whose recorded machine
#    features (incl. pseudo-features like +prefer-no-scatter) never
#    match the loader's host-feature probe, so every lookup warns and
#    recompiles (verified with a fresh cache dir: 2nd run compiles
#    are as slow as the 1st). Don't configure one.
# XLA parses XLA_FLAGS lazily at first backend use, so setting it here
# (after the sitecustomize jax import, before any compile) works.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_backend_optimization_level=0").strip()

# Repo root on sys.path so `space_time_pde_tpu` imports without install.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def subprocess_env(cache_suffix: str = "", **extra):
    """Environment for tests that spawn fresh interpreters (driver CLIs,
    multihost runs): CPU platform + the same compile-time-over-run-time
    XLA optimization level the in-process suite uses (see the comment
    above — the persistent compilation cache does not work for XLA:CPU
    here, so fast compiles are the only lever).

    cache_suffix: kept for call-site compatibility; unused now that no
    per-process cache directories exist."""
    del cache_suffix
    env = dict(
        os.environ,
        STPDE_PLATFORM="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                   " --xla_backend_optimization_level=0").strip(),
    )
    env.update({k: str(v) for k, v in extra.items()})
    return env


def load_driver(experiment: str, modname: str):
    """Import experiments/<experiment>/<modname>.py fresh.

    The experiment drivers are sibling scripts (``train.py``,
    ``evaluation.py``, ...) that import each other by bare name, so two
    experiments' drivers collide in ``sys.modules``. Tests must load
    them through this helper, which evicts any same-named driver module
    first and scopes the path insertion.
    """
    import importlib

    path = os.path.join(_ROOT, "experiments", experiment)
    for m in ("train", "evaluation", "generate_data"):
        sys.modules.pop(m, None)
    sys.path.insert(0, path)
    try:
        return importlib.import_module(modname)
    finally:
        sys.path.remove(path)
