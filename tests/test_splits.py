"""Split-protocol windows: deterministic, in-range, val/test disjoint."""

import numpy as np
import pytest

import space_time_pde_tpu.data.splits as splits
from space_time_pde_tpu.data.splits import (
    SplitSpec, val_windows, window_starts,
)


def test_windows_deterministic_and_in_range():
    v1 = val_windows(200, 16, 4)
    v2 = val_windows(200, 16, 4)
    np.testing.assert_array_equal(v1, v2)
    assert v1.min() >= 0 and v1.max() <= 200 - 16
    assert len(v1) == 4


def test_val_test_windows_disjoint():
    v = set(val_windows(200, 16, 4).tolist())
    t = set(splits.test_windows(200, 16, 4).tolist())
    assert v.isdisjoint(t)
    assert len(t) == 4


def test_short_data_windows_stay_disjoint():
    """max_t0 < 2*n_windows: the int cast used to round an odd (test)
    grid point onto an even (val) one — collisions must be dropped, with
    a warning when fewer than n_windows survive."""
    n_frames, nt, nw = 21, 16, 4          # max_t0 = 5 < 2*4
    v = set(val_windows(n_frames, nt, nw).tolist())
    with pytest.warns(UserWarning, match="disjoint"):
        t = set(splits.test_windows(n_frames, nt, nw).tolist())
    assert v.isdisjoint(t)
    assert len(t) >= 1
    # Degenerate case: no disjoint test window exists at all.
    with pytest.raises(ValueError, match="too short"):
        splits.test_windows(16, 16, 2)


def test_window_starts_rejects_short_data():
    with pytest.raises(ValueError, match="< window nt"):
        window_starts(10, 16, 2)


def test_canonical_split_filenames():
    s = SplitSpec.canonical()
    assert s.train_data == "rb2d_ra1e6_s42.npz"
    assert s.val_data == "rb2d_ra1e6_s7.npz"
    assert s.test_data == "rb2d_ra1e6_s123.npz"
    assert len({s.train_data, s.val_data, s.test_data}) == 3


def test_check_train_files_flags_heldout_seeds():
    # seed 123 (test) hides inside a 100..199 sweep; 7 (val) likewise.
    # Leakage is a hard error by default (a long run must not proceed
    # past a voided split protocol)...
    bad = ",".join(f"beltrami_s{s}.npz" for s in (42, 122, 123, 124))
    with pytest.raises(SystemExit, match="canonical test"):
        splits.check_train_files(bad)
    with pytest.raises(SystemExit, match="canonical val"):
        splits.check_train_files("rb2d_ra1e6_s42.npz,rb2d_ra1e6_s7.npz")
    # ...and downgrades to a warning with the explicit opt-out (flag or
    # STPDE_ALLOW_SPLIT_LEAK=1).
    with pytest.warns(UserWarning, match="canonical test"):
        splits.check_train_files(bad, allow_leak=True)
    import os
    os.environ["STPDE_ALLOW_SPLIT_LEAK"] = "1"
    try:
        with pytest.warns(UserWarning, match="canonical test"):
            splits.check_train_files(bad)
    finally:
        del os.environ["STPDE_ALLOW_SPLIT_LEAK"]


def test_check_train_files_flags_eval_overlap():
    # Direct train/eval overlap (non-canonical filenames, dir-qualified
    # paths) warns — the reference-quickstart protocol is legal but the
    # numbers measure training fit, so say so.
    with pytest.warns(UserWarning, match="also an eval"):
        splits.check_train_files(
            "beltrami_s150.npz,beltrami_s151.npz",
            eval_data="elsewhere/beltrami_s150.npz")
    # No overlap, no canonical seeds: silent.
    import warnings as w
    with w.catch_warnings():
        w.simplefilter("error")
        splits.check_train_files("a_s1.npz,b_s2.npz",
                                 eval_data="c_s3.npz")


def test_check_train_files_clean_list_is_silent():
    import warnings as w
    ok = ",".join(f"beltrami_s{s}.npz"
                  for s in [42] + [s for s in range(100, 200) if s != 123])
    with w.catch_warnings():
        w.simplefilter("error")
        splits.check_train_files(ok)
        # substring seeds (s1077 etc.) must not false-positive
        splits.check_train_files("rb2d_ra1e6_s1077.npz,x_s1230.npz")
