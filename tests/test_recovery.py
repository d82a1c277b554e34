"""Cliff auto-recovery: detector unit tests + a driver-level run that
genuinely walks off the measured 2nd-order cliff (absurd lr) and must
self-recover by restoring the last checkpoint at reduced lr instead of
aborting (reference leaves this babysitting to a human; SURVEY §5
failure-detection row, BASELINE.md spike dissection)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import subprocess_env
from space_time_pde_tpu.data import save_npz, taylor_green_fields
from space_time_pde_tpu.train.recovery import CliffDetector

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_detector_healthy_run_never_fires():
    det = CliffDetector()
    rng = np.random.RandomState(0)
    for i in range(200):
        # decaying loss with noise, occasional 10x spike — all healthy
        v = 0.5 * np.exp(-i / 50) * (1 + rng.rand())
        if i % 37 == 0:
            v *= 10
        assert det.update({"loss": v, "pde_loss": v / 3}) is None


def test_detector_finite_explosion():
    det = CliffDetector()
    for _ in range(10):
        assert det.update({"loss": 0.05, "pde_loss": 0.02}) is None
    # the measured signature: pde residual at 1e10-1e12
    reason = det.update({"loss": 0.05, "pde_loss": 3.2e11})
    assert reason is not None and "explosion" in reason


def test_detector_explosion_without_history():
    # First-ever observed epoch already exploded (e.g. right after a
    # resume): the absolute floor alone must catch it.
    det = CliffDetector()
    assert det.update({"loss": 4e9}) is not None
    det2 = CliffDetector()
    assert det2.update({"loss": 0.8}) is None  # healthy first epoch


def test_detector_nonfinite_streak():
    det = CliffDetector()
    assert det.update({"loss": 0.1}) is None
    # one non-finite epoch is the known benign transient
    assert det.update({"loss": float("nan")}) is None
    # two in a row = frozen on the cliff
    reason = det.update({"loss": float("inf")})
    assert reason is not None and "non-finite" in reason
    # reset clears the streak but keeps the running scale
    det.reset()
    assert det.update({"loss": float("nan")}) is None
    assert det.update({"loss": 0.1}) is None
    assert det.update({"loss": 1e9}) is not None


def _recovery_base_cmd(tmp_path):
    save_npz(str(tmp_path / "tg.npz"),
             taylor_green_fields(nt=12, nz=16, nx=16, dt=0.05))
    log_dir = tmp_path / "log"
    return log_dir, [
        sys.executable, "-u",
        os.path.join(_ROOT, "experiments", "rb2d", "train.py"),
        "--data_folder", str(tmp_path),
        "--train_data", "tg.npz", "--eval_data", "tg.npz",
        "--nt", "8", "--nz", "16", "--nx", "16",
        "--downsamp_t", "2", "--downsamp_xz", "4",
        "--n_samp_pts_per_crop", "16",
        "--lat_dims", "4", "--unet_nf", "4", "--imnet_nf", "2",
        "--pseudo_epoch_size", "8", "--batch_size_per_gpu", "2",
        "--alpha_pde", "0.1", "--rayleigh", "100",
        "--pde_loss_type", "l2", "--log_dir", str(log_dir),
        "--device_data", "0",
    ]


def test_train_cli_smoke(tmp_path):
    """The per-driver fast CLI smoke kept in the default run (the
    multi-minute recovery scenarios below are opt-in `slow`): one
    healthy epoch of the rb2d train CLI exits 0, prints finite
    metrics, and writes a restorable checkpoint.

    alpha_pde 0 here: the jet-loss train-step graph is the single
    biggest XLA:CPU compile in the CLI (~35 s of the smoke); the
    PDE-on CLI path is covered by the slow recovery scenarios and the
    turb3d smoke, the jet numerics by test_jet/test_fused_jet."""
    log_dir, base = _recovery_base_cmd(tmp_path)
    out = subprocess.run(
        base + ["--epochs", "1", "--lr", "1e-3", "--alpha_pde", "0"],
        env=subprocess_env(), capture_output=True, text=True, timeout=540)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    epoch_lines = [l for l in out.stdout.splitlines()
                   if l.startswith("epoch ")]
    assert epoch_lines, out.stdout[-2000:]
    assert all("nan" not in l and "inf" not in l for l in epoch_lines), \
        epoch_lines
    assert (log_dir / "checkpoints").is_dir()


@pytest.mark.slow
def test_driver_cliff_recovery(tmp_path):
    """[slow, opt-in: pytest -m slow — two full-interpreter train-CLI
    runs, ~2 min on this 1-core box; the healthy-epoch half of this
    scenario stays in the default run as test_train_cli_smoke]
    Phase 1 trains one healthy epoch (writes a checkpoint). Phase 2
    resumes with an absurd lr: the first epoch explodes, the driver
    must print CLIFF RECOVERY, restore, continue at
    lr x recovery_lr_factor (sane again) and finish with exit 0."""
    log_dir, base = _recovery_base_cmd(tmp_path)
    env = subprocess_env()

    out1 = subprocess.run(
        base + ["--epochs", "1", "--lr", "1e-3"],
        env=env, capture_output=True, text=True, timeout=540)
    assert out1.returncode == 0, out1.stdout[-3000:] + out1.stderr[-3000:]

    # epochs 4, not 3: when the cliff manifests as a non-finite STREAK
    # (two epochs) rather than a finite explosion (one epoch), recovery
    # fires at epoch 2 and the healthy post-recovery epoch the test
    # asserts on needs epoch 3 to exist.
    out2 = subprocess.run(
        base + ["--epochs", "4", "--lr", "1e6",
                "--recovery_lr_factor", "1e-9",
                "--resume", str(log_dir / "checkpoints")],
        env=env, capture_output=True, text=True, timeout=540)
    assert out2.returncode == 0, out2.stdout[-3000:] + out2.stderr[-3000:]
    assert "CLIFF RECOVERY" in out2.stdout, out2.stdout[-3000:]
    # after recovery the run kept training at the reduced lr: the
    # post-recovery epochs print healthy (finite) metrics
    post = out2.stdout.split("CLIFF RECOVERY")[-1]
    epoch_lines = [l for l in post.splitlines() if l.startswith("epoch ")]
    assert epoch_lines, post[-2000:]
    assert all("nan" not in l and "inf" not in l for l in epoch_lines), \
        epoch_lines


@pytest.mark.slow
def test_driver_cliff_recovery_disabled(tmp_path):
    """[slow, opt-in: pytest -m slow — one extra full-interpreter
    train-CLI compile, ~40 s on this 1-core box] With --cliff_recovery 0
    the driver must never restore/rescale: it either spins on skipped
    updates or aborts on param corruption, but no CLIFF RECOVERY line
    may appear."""
    log_dir, base = _recovery_base_cmd(tmp_path)
    env = subprocess_env()

    out1 = subprocess.run(
        base + ["--epochs", "1", "--lr", "1e-3"],
        env=env, capture_output=True, text=True, timeout=540)
    assert out1.returncode == 0, out1.stdout[-3000:] + out1.stderr[-3000:]

    out3 = subprocess.run(
        base + ["--epochs", "2", "--lr", "1e6",
                "--cliff_recovery", "0",
                "--resume", str(log_dir / "checkpoints")],
        env=env, capture_output=True, text=True, timeout=540)
    assert "CLIFF RECOVERY" not in out3.stdout, out3.stdout[-3000:]


@pytest.mark.slow
def test_turb3d_driver_cliff_recovery(tmp_path):
    """[slow, opt-in: pytest -m slow — the recovery wiring is shared
    with rb2d, whose driver test stays in the default run]
    Same contract as the rb2d driver test, for the 4-D driver
    (which diverged unrecoverably before the wiring — the measured
    lr-1e-2/l2 multi-realization failure in BASELINE.md round-3
    turb3d section): phase 1 banks a healthy checkpoint, phase 2's
    absurd lr must trigger CLIFF RECOVERY and finish healthy."""
    from space_time_pde_tpu.data import abc_flow_fields

    save_npz(str(tmp_path / "abc.npz"),
             abc_flow_fields(nt=8, nz=8, ny=8, nx=8, dt=0.05))
    log_dir = tmp_path / "log"
    base = [
        sys.executable, "-u",
        os.path.join(_ROOT, "experiments", "turb3d", "train.py"),
        "--data_folder", str(tmp_path),
        "--train_data", "abc.npz", "--eval_data", "abc.npz",
        "--nt", "4", "--nz", "8", "--ny", "8", "--nx", "8",
        "--downsamp_t", "2", "--downsamp_xyz", "2",
        "--n_samp_pts_per_crop", "16",
        "--lat_dims", "4", "--unet_nf", "4", "--imnet_nf", "2",
        "--pseudo_epoch_size", "8", "--batch_size_per_gpu", "2",
        "--alpha_pde", "0.1", "--pde_loss_type", "l2",
        "--log_dir", str(log_dir), "--device_data", "0",
    ]
    env = subprocess_env()

    out1 = subprocess.run(
        base + ["--epochs", "1", "--lr", "1e-3"],
        env=env, capture_output=True, text=True, timeout=540)
    assert out1.returncode == 0, out1.stdout[-3000:] + out1.stderr[-3000:]

    out2 = subprocess.run(
        base + ["--epochs", "4", "--lr", "1e6",
                "--recovery_lr_factor", "1e-9",
                "--resume", str(log_dir / "checkpoints")],
        env=env, capture_output=True, text=True, timeout=540)
    assert out2.returncode == 0, out2.stdout[-3000:] + out2.stderr[-3000:]
    assert "CLIFF RECOVERY" in out2.stdout, out2.stdout[-3000:]
    post = out2.stdout.split("CLIFF RECOVERY")[-1]
    epoch_lines = [l for l in post.splitlines() if l.startswith("epoch ")]
    assert epoch_lines, post[-2000:]
    assert all("nan" not in l and "inf" not in l for l in epoch_lines), \
        epoch_lines
