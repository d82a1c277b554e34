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

# Persistent XLA compilation cache: the suite's wall time is dominated
# by shard_map/scan compiles (the shapes are tiny); caching them makes
# every run after the first start warm. Keyed on program + jax version,
# so stale hits are not a correctness risk.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/stpde_xla_test"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Repo root on sys.path so `space_time_pde_tpu` imports without install.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def subprocess_env(cache_suffix: str = "", **extra):
    """Environment for tests that spawn fresh interpreters (driver CLIs,
    multihost runs): CPU platform + the SAME persistent compilation
    cache this conftest configures in-process. Without it every
    subprocess recompiles the full train/eval programs from scratch —
    measured at 60-90 s per interpreter, the dominant cost of the
    driver-level tests.

    cache_suffix: give each process of a MULTI-PROCESS run its own
    cache directory (e.g. the process id). With a shared directory one
    process can hit entries the other misses and race ahead to the
    first cross-process collective, whose Gloo context init times out
    after a hard 30 s — warm/cold asymmetry larger than that kills the
    run. Per-process caches keep the skew symmetric (and still warm
    across suite runs)."""
    env = dict(
        os.environ,
        STPDE_PLATFORM="cpu",
        JAX_COMPILATION_CACHE_DIR=os.path.expanduser(
            "~/.cache/stpde_xla_test" + cache_suffix),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
    )
    env.pop("XLA_FLAGS", None)
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
