"""Multi-host entry point: a REAL two-process jax.distributed run.

Two fresh interpreters (1 CPU device each) join via
``init_multihost`` over localhost gRPC, build ONE global 2-device
'data' mesh, assemble per-process host batches with ``global_batch``
(make_array_from_process_local_data), and run ``make_dp_train_step``
— the pmean gradient sync crosses the process boundary. This is the
code path a v5e pod-slice multi-host run takes (DCN instead of
localhost gRPC).

The model here is a deliberately tiny linear regression: the full
train-CLI multihost path (UNet+query+eval+orbax checkpoints, shared
--log_dir) was verified manually but costs ~10 min under CPU Gloo —
too slow for CI. The primitives exercised are identical.
"""

import os
import socket
import subprocess
import sys

import pytest

from conftest import subprocess_env

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import sys
sys.path.insert(0, "@ROOT@")
from space_time_pde_tpu.utils.platform import maybe_force_platform
maybe_force_platform()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from space_time_pde_tpu.parallel import (
    global_batch, init_multihost, make_dp_train_step, replicate_state,
)
from space_time_pde_tpu.train.trainer import TrainState

pid, nproc = init_multihost()
assert nproc == 2, nproc
print(f"multihost: process {pid}/{nproc}, "
      f"{jax.local_device_count()} local of "
      f"{jax.device_count()} global devices", flush=True)

# Tiny linear model; loss matches the trainer's (params, batch[, stats])
# calling convention.
def loss_fn(params, batch, *unused):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {"loss": loss}

tx = optax.sgd(0.1)
params = {"w": jnp.zeros((3, 1))}
state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), key=jax.random.PRNGKey(0))
step, mesh = make_dp_train_step(loss_fn, tx)
state = replicate_state(state, mesh)

# Each process contributes ITS half of the global batch; different rows
# per process, so the psum'd gradient really crosses the wire.
rng = np.random.RandomState(pid)
local = {"x": rng.randn(2, 3).astype(np.float32),
         "y": rng.randn(2, 1).astype(np.float32)}
batch = global_batch(local, mesh)
assert batch["x"].shape == (4, 3), batch["x"].shape

state, metrics = step(state, batch)
w = np.asarray(jax.device_get(state.params["w"])).ravel()
print("loss", float(metrics["loss"]), "w", " ".join(f"{v:.6f}" for v in w),
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step(tmp_path):
    runner = tmp_path / "runner.py"
    runner.write_text(_RUNNER.replace("@ROOT@", _ROOT))
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = subprocess_env(
            cache_suffix=f"_mh{pid}",
            STPDE_COORDINATOR=f"localhost:{port}",
            STPDE_NUM_PROCESSES=2,
            STPDE_PROCESS_ID=pid,
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-u", str(runner)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    assert "multihost: process 0/2, 1 local of 2 global devices" in outs[0]
    assert "multihost: process 1/2" in outs[1]
    # The psum'd update must leave both processes with IDENTICAL
    # replicated params computed from the union of both host batches.
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("loss ")]
        assert line, out[-2000:]
        results.append(line[0])
    assert results[0] == results[1], results

    # And the result must equal the single-process global-batch step.
    import jax
    import jax.numpy as jnp
    import numpy as np

    xs, ys = [], []
    for pid in (0, 1):
        rng = np.random.RandomState(pid)
        xs.append(rng.randn(2, 3).astype(np.float32))
        ys.append(rng.randn(2, 1).astype(np.float32))
    x, y = np.concatenate(xs), np.concatenate(ys)
    w = jnp.zeros((3, 1))
    grad = jax.grad(lambda w: jnp.mean((x @ w - y) ** 2))(w)
    want = np.asarray(w - 0.1 * grad).ravel()
    got = np.asarray([float(v) for v in results[0].split("w ")[1].split()])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_two_process_train_cli(tmp_path):
    """[slow, opt-in: pytest -m slow] The ACTUAL
    experiments/rb2d/train.py --multihost CLI, two
    processes on localhost gRPC: tiny shapes, 2 epochs, shared
    --log_dir with a coordinated orbax save. PDE loss ON
    (alpha_pde 0.05): the configuration users actually run multihost —
    the 2nd-order jet residual path — crosses jax.distributed here."""
    import numpy as np

    from space_time_pde_tpu.data import save_npz, taylor_green_fields

    save_npz(str(tmp_path / "tg.npz"),
             taylor_green_fields(nt=12, nz=16, nx=16, dt=0.05))
    log_dir = tmp_path / "log"
    port = _free_port()
    cli = os.path.join(_ROOT, "experiments", "rb2d", "train.py")
    argv = [
        sys.executable, "-u", cli,
        "--multihost",
        "--data_folder", str(tmp_path),
        "--train_data", "tg.npz", "--eval_data", "tg.npz",
        "--nt", "8", "--nz", "16", "--nx", "16",
        "--downsamp_t", "2", "--downsamp_xz", "4",
        "--n_samp_pts_per_crop", "16",
        "--lat_dims", "4", "--unet_nf", "4", "--imnet_nf", "2",
        "--epochs", "2", "--pseudo_epoch_size", "4",
        "--batch_size_per_gpu", "2", "--alpha_pde", "0.05",
        "--rayleigh", "100",
        "--lr", "1e-3", "--log_dir", str(log_dir),
        "--device_data", "0",
    ]
    procs = []
    for pid in (0, 1):
        env = subprocess_env(
            cache_suffix=f"_mh{pid}",
            STPDE_COORDINATOR=f"localhost:{port}",
            STPDE_NUM_PROCESSES=2,
            STPDE_PROCESS_ID=pid,
        )
        procs.append(subprocess.Popen(
            argv, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        # Two interpreters compile the train+eval programs concurrently;
        # on a single-core box that serializes to ~4-6 min worst case.
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
    assert "multihost: process 0/2, 1 local of 2 global devices" in outs[0]

    # Identical global step => identical printed epoch metrics on both
    # processes (the psum'd loss crosses the wire). Strip the
    # per-process wall-clock suffix before comparing.
    def epoch_lines(out):
        return [ln.split(" (")[0] for ln in out.splitlines()
                if ln.startswith("epoch ")]

    e0, e1 = epoch_lines(outs[0]), epoch_lines(outs[1])
    assert len(e0) == 2, outs[0][-2000:]
    assert e0 == e1, (e0, e1)

    # Coordinated orbax save landed in the SHARED log_dir and is
    # restorable (metrics logger wrote only on process 0).
    ckpts = log_dir / "checkpoints"
    assert ckpts.is_dir()
    from space_time_pde_tpu.utils.checkpoint import CheckpointManager
    mngr = CheckpointManager(str(ckpts))
    _, extra = mngr.restore()
    assert int(extra["epoch"]) == 1
    mngr.close()
    assert (log_dir / "metrics.jsonl").exists()
