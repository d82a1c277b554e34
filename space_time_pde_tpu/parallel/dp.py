"""Data parallelism: shard_map over a device mesh with psum grad sync.

TPU-native replacement for the reference's ``torch.nn.DataParallel``
(single-process replicate/scatter/gather in ``experiments/rb2d/
train.py``): the SAME jitted train step runs on a 1-D ``Mesh('data')``
of any size — each device holds a batch shard, gradients and metrics
are averaged with ``jax.lax.pmean`` (an XLA all-reduce that rides ICI
on a TPU slice), and parameters/optimizer state stay replicated, so
every device applies an identical update. Multi-host extends this by
calling ``jax.distributed.initialize`` before mesh construction —
no code changes (XLA routes inter-slice collectives over DCN).

Tested on a virtual 8-device CPU mesh
(``jax.config.jax_num_cpu_devices``); identical code runs on v5e-8+.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from space_time_pde_tpu.train.trainer import TrainState

__all__ = ["make_mesh", "make_dp_train_step", "make_dp_multi_step",
           "replicate_state", "shard_batch", "init_multihost",
           "global_batch"]


def init_multihost(**kwargs) -> Tuple[int, int]:
    """Join a multi-host (multi-process) run over DCN.

    Wraps ``jax.distributed.initialize`` (coordinator address / process
    count / process id resolve from the environment on TPU pods, or can
    be passed through via kwargs). Must be called before any other JAX
    device use. After this, ``jax.devices()`` is the GLOBAL device list,
    so the same ``make_mesh``/``shard_map`` train step scales across
    hosts — XLA routes intra-slice collectives over ICI and inter-slice
    ones over DCN. Returns (process_index, process_count).

    Outside auto-detected clusters (TPU pods, Slurm, ...) the topology
    can be given via env vars ``STPDE_COORDINATOR`` (host:port),
    ``STPDE_NUM_PROCESSES`` and ``STPDE_PROCESS_ID`` — used by the
    two-process CPU integration test.
    """
    import os
    for key, env, cast in (
            ("coordinator_address", "STPDE_COORDINATOR", str),
            ("num_processes", "STPDE_NUM_PROCESSES", int),
            ("process_id", "STPDE_PROCESS_ID", int)):
        if key not in kwargs and env in os.environ:
            kwargs[key] = cast(os.environ[env])
    jax.distributed.initialize(**kwargs)
    # Establish the cross-process collective (Gloo/DCN) context NOW,
    # while every process is still in lockstep at startup. The first
    # collective's context init has a hard 30 s rendezvous window; if
    # it instead happened at the first train step, any compile-time
    # skew between processes (e.g. one process hitting a warm
    # compilation cache the other misses) larger than 30 s would kill
    # the run with a spurious DEADLINE_EXCEEDED.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("stpde:init_multihost")
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def global_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                 axis: str = "data", batch_axis: int = 0
                 ) -> Dict[str, jnp.ndarray]:
    """Assemble per-process host batches into one global sharded batch.

    Each process passes ITS slice of the global batch (global size /
    process_count rows of ``batch_axis``); the result is a jax.Array
    sharded over ``axis`` whose addressable shards come from local host
    memory only — the multi-host analog of :func:`shard_batch`.
    ``batch_axis=1`` matches :func:`make_dp_multi_step`'s stacked
    [n_inner, batch, ...] layout.
    """
    spec = P(*([None] * batch_axis), axis)
    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every state leaf replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh,
                axis: str = "data") -> Dict[str, jnp.ndarray]:
    """Shard each batch array along its leading (batch) axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(loss_fn, tx: optax.GradientTransformation,
                       n_devices: Optional[int] = None,
                       axis: str = "data"):
    """Build (jitted shard_map step, mesh).

    step(state, batch): state replicated, batch sharded on axis 0;
    returns (new replicated state, pmean'd metrics). The global batch
    size must be divisible by the mesh size.
    """
    mesh = make_mesh(n_devices, axis)
    shard_step = _dp_step_body(loss_fn, tx, axis)

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, batch):
        return mapped(state, batch)

    return step, mesh


def make_dp_multi_step(loss_fn, tx: optax.GradientTransformation,
                       n_inner: int, n_devices: Optional[int] = None,
                       axis: str = "data"):
    """Data-parallel step chaining ``n_inner`` optimizer updates per
    dispatch (lax.scan inside the shard_map).

    step(state, stacked_batch): every batch array has a leading
    [n_inner] axis (unsharded) and is sharded on ``axis`` along its
    second (batch) axis. Returns (state after n_inner psum'd updates,
    last step's metrics) — the multi-device analog of
    ``trainer.make_multi_step`` (host/dispatch latency amortization
    survives scaling out; round-1 left it single-device only).
    """
    mesh = make_mesh(n_devices, axis)
    one = _dp_step_body(loss_fn, tx, axis)

    def shard_step(state: TrainState, stacked):
        state, metrics = jax.lax.scan(one, state, stacked)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, stacked):
        return mapped(state, stacked)

    return step, mesh


def _dp_step_body(loss_fn, tx, axis):
    from space_time_pde_tpu.train.trainer import _apply_grads, _loss_args

    def shard_step(state: TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch,
                                   *_loss_args(state))
        grads = jax.lax.pmean(grads, axis)
        # BatchNorm running stats (if present) are NOT pmean'd here:
        # the model's bn_axis_name pmean already made them identical
        # across replicas inside apply.
        new_stats = metrics.pop("_batch_stats", None)
        metrics = jax.lax.pmean(metrics, axis)
        if new_stats is not None:
            metrics["_batch_stats"] = new_stats
        return _apply_grads(state, tx, grads, metrics)

    return shard_step
