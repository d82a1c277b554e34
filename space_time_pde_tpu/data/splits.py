"""Formal train / val / test split protocol.

The reference quickstart trains and evaluates on the SAME simulation
npz (``experiments/rb2d/train.py`` takes ``--train_data`` and
``--eval_data``, typically both ``rb2d_ra1e6_s42.npz``), which
overstates quality. This module defines the protocol this build's
numbers are reported under (BASELINE.md "model quality"):

- **train**: the full training simulation (seed 42 by default) —
  random crops, all frames.
- **val**: an INDEPENDENT simulation (different PRNG seed => fully
  decorrelated turbulent trajectory), windows ``val_windows(...)``.
  Used for train-time model selection (the driver's per-epoch eval and
  best-checkpoint logic).
- **test**: a THIRD independent simulation, windows
  ``test_windows(...)``. Touched only for final reported numbers.

Window starts are deterministic functions of the data length so every
run/report uses identical frames: val windows are the even grid of
``n`` starts over the valid range, test windows the odd interleave
(maximally separated from the val grid under the same spacing).

Canonical filenames (our generator's convention —
``experiments/rb2d/generate_data.py --seed S``):
``rb2d_ra1e6_s42.npz`` (train), ``..._s7.npz`` (val),
``..._s123.npz`` (test).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

import numpy as np

__all__ = ["SplitSpec", "window_starts", "val_windows", "test_windows",
           "check_train_files", "CANONICAL_SEEDS"]

CANONICAL_SEEDS = {"train": 42, "val": 7, "test": 123}


def check_train_files(train_data: str, eval_data: str = "",
                      allow_leak: bool | None = None) -> None:
    """Abort if a held-out file is in the training list.

    The multi-simulation ``--train_data a.npz,b.npz,...`` convention
    makes it easy to sweep a seed range that accidentally contains a
    held-out canonical seed (e.g. 123 lies inside 100..199), which
    silently voids the split protocol — so leakage is a hard error
    (``SystemExit``), not a warning a long run can scroll past. Two
    checks:

    1. canonical ``_s{val}/_s{test}.npz`` suffixes (covers both the
       rb2d and turb3d file conventions);
    2. any ``eval_data``/``val_data`` basename appearing verbatim in
       the train list (catches renamed copies and non-canonical
       held-out files the suffix convention misses) — a WARNING only,
       because the reference quickstart legitimately trains and evals
       on the same simulation (SURVEY §4 "integration testing =
       running the demo").

    Intentional train-on-a-canonical-held-out-seed runs opt out with
    ``allow_leak=True`` — wired to the drivers' ``--allow_split_leak``
    flag — or ``STPDE_ALLOW_SPLIT_LEAK=1``.
    """
    import os

    if allow_leak is None:
        allow_leak = os.environ.get("STPDE_ALLOW_SPLIT_LEAK", "") == "1"

    def fail(msg):
        msg += (" — held-out numbers reported from this run are void;"
                " pass --allow_split_leak (or STPDE_ALLOW_SPLIT_LEAK=1)"
                " for an intentional train-on-everything run")
        if allow_leak:
            warnings.warn(msg)
        else:
            raise SystemExit("split protocol violation: " + msg)

    names = [s.strip() for s in train_data.split(",") if s.strip()]
    held_out = {f"_s{CANONICAL_SEEDS[k]}.npz": k for k in ("val", "test")}
    for name in names:
        for suffix, split in held_out.items():
            if name.endswith(suffix):
                fail(f"--train_data contains {name}, the canonical "
                     f"{split} simulation (seed {CANONICAL_SEEDS[split]})")
    eval_names = {os.path.basename(s.strip())
                  for s in (eval_data or "").split(",") if s.strip()}
    for name in names:
        if os.path.basename(name) in eval_names:
            warnings.warn(
                f"--train_data contains {name}, which is also an "
                "eval/val file of this run — eval numbers measure "
                "training-simulation fit, not held-out generalization "
                "(the reference-quickstart protocol)")


def window_starts(n_frames: int, nt: int, n_windows: int,
                  parity: int = 0) -> np.ndarray:
    """Deterministic window-start frames.

    Lay a 2*n_windows-point even grid of candidate starts over
    ``[0, n_frames - nt]`` and take the even (parity=0 -> val) or odd
    (parity=1 -> test) points, so val and test windows of the same
    data file never coincide and are maximally spaced.
    """
    if n_frames < nt:
        raise ValueError(f"n_frames {n_frames} < window nt {nt}")
    max_t0 = n_frames - nt
    grid = np.linspace(0, max_t0, 2 * n_windows + 1)
    val = np.unique(grid[0::2][:n_windows].astype(int))
    if not parity:
        return val
    # Short datasets (max_t0 < 2*n_windows) can round an odd (test)
    # grid point onto an even (val) one; drop such collisions so the
    # 'val and test windows never coincide' guarantee actually holds.
    test = np.setdiff1d(np.unique(grid[1::2].astype(int)), val)
    if len(test) == 0:
        raise ValueError(
            f"dataset too short for disjoint val/test windows: "
            f"n_frames={n_frames}, nt={nt}, n_windows={n_windows}")
    if len(test) < n_windows:
        warnings.warn(
            f"only {len(test)}/{n_windows} test windows are disjoint "
            f"from val windows (n_frames={n_frames}, nt={nt})")
    return test


def val_windows(n_frames: int, nt: int, n_windows: int = 4) -> np.ndarray:
    return window_starts(n_frames, nt, n_windows, parity=0)


def test_windows(n_frames: int, nt: int, n_windows: int = 4) -> np.ndarray:
    return window_starts(n_frames, nt, n_windows, parity=1)


@dataclass
class SplitSpec:
    """Resolved file names for one experiment's protocol."""
    train_data: str
    val_data: str
    test_data: str

    @classmethod
    def canonical(cls, prefix: str = "rb2d_ra1e6") -> "SplitSpec":
        return cls(
            train_data=f"{prefix}_s{CANONICAL_SEEDS['train']}.npz",
            val_data=f"{prefix}_s{CANONICAL_SEEDS['val']}.npz",
            test_data=f"{prefix}_s{CANONICAL_SEEDS['test']}.npz",
        )
