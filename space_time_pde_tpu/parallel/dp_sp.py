"""2-D mesh training: data parallelism x sharded-grid query parallelism.

Combines the two parallelism axes this model family has (SURVEY.md §2:
no attention/pipeline structure exists to tp/pp over):

- ``data``: batch crops sharded; gradients psum'd (ICI all-reduce);
- ``space``: the latent grid is sharded along its x axis and each
  device queries only the points binned to its coordinate range, with a
  one-node ``ppermute`` halo resolving boundary cells
  (see parallel/halo.py). Losses are masked (bins are ragged) and
  reduced with cross-axis psums so the result equals the unsharded
  computation.

Two encoder modes: replicated (each space-rank encodes its data shard
fully, then slices its latent shard — cheap for small grids) or
``sharded_encoder=True`` with a halo-conv
:class:`~space_time_pde_tpu.parallel.sharded_unet.ShardedUNet3d`, where
neither the input grid nor the latent grid is ever materialized whole
on one device (grids beyond one chip's HBM).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from space_time_pde_tpu.parallel.halo import (
    sharded_query_jet,
    sharded_query_local_implicit_grid,
)
from space_time_pde_tpu.train.trainer import TrainState

__all__ = ["make_dp_sp_train_step", "make_dp_sp_batch",
           "stack_dp_sp_batches"]


def make_dp_sp_batch(batch: Dict[str, np.ndarray], n_space: int,
                     n_nodes_x: int, m_round: int = 64
                     ) -> Dict[str, np.ndarray]:
    """Bin each sample's points by x-shard; pad ragged bins + mask.

    In: point_coord [B, N, D], point_value [B, N, V], lres [B, ...].
    Out: point_coord [B, S, M, D], point_value [B, S, M, V],
    point_mask [B, S, M]; lres unchanged. Dimension-agnostic: points
    bin along their LAST coordinate (the x axis of (t, z, x) 3-D crops
    and of (t, z, y, x) 4-D crops alike), matching halo.py's default
    ``spatial_axis=-2`` grid sharding.

    Fully vectorized over (batch, points) — this runs per step on the
    host, so no Python per-sample/per-shard loops. ``m_round`` rounds
    the ragged-bin pad size M up to a bucket multiple so the jitted
    step sees a handful of static shapes instead of recompiling for
    every distinct max-bin-count. Padded slots point at the shard's own
    lower x bound (always in-range) and are masked out of every loss.
    """
    coords = batch["point_coord"]
    values = batch["point_value"]
    b, n, d = coords.shape
    n_loc = n_nodes_x // n_space
    span = 1.0 / (n_nodes_x - 1)

    x = coords[..., -1]
    cellf = np.clip(x / span, 0, n_nodes_x - 1 - 1e-6)
    shard = np.clip((cellf // n_loc).astype(np.int64), 0,
                    n_space - 1)                               # [B, N]
    order = np.argsort(shard, axis=1, kind="stable")           # [B, N]
    sshard = np.take_along_axis(shard, order, axis=1)          # [B, N]
    counts = (sshard[:, :, None]
              == np.arange(n_space)[None, None]).sum(1)        # [B, S]
    m_max = int(counts.max()) if n else 1
    m = (max(m_round, -(-m_max // m_round) * m_round)
         if m_round else m_max)
    starts = np.concatenate(
        [np.zeros((b, 1), counts.dtype), np.cumsum(counts, 1)[:, :-1]],
        axis=1)                                                # [B, S]
    rank = (np.arange(n)[None]
            - np.take_along_axis(starts, sshard, axis=1))      # [B, N]
    bidx = np.broadcast_to(np.arange(b)[:, None], (b, n))

    pad_coord = np.zeros((n_space, d), coords.dtype)
    pad_coord[:, -1] = np.arange(n_space) * n_loc * span
    binned = np.broadcast_to(
        pad_coord[None, :, None, :], (b, n_space, m, d)).copy()
    vals = np.zeros((b, n_space, m, values.shape[-1]), values.dtype)
    mask = np.zeros((b, n_space, m), np.float32)
    binned[bidx, sshard, rank] = np.take_along_axis(
        coords, order[..., None], axis=1)
    vals[bidx, sshard, rank] = np.take_along_axis(
        values, order[..., None], axis=1)
    mask[bidx, sshard, rank] = 1.0

    out = dict(batch)
    out["point_coord"] = binned
    out["point_value"] = vals
    out["point_mask"] = mask
    return out


def stack_dp_sp_batches(batches) -> Dict[str, np.ndarray]:
    """Stack G dp-sp batches along a new leading axis (for lax.scan
    multi-step training); ragged M axes are edge-padded (the last slot
    of each bin is always an in-range, masked-out point)."""
    m = max(bb["point_coord"].shape[2] for bb in batches)

    def pad_m(a, masked):
        if a.shape[2] == m:
            return a
        width = [(0, 0)] * a.ndim
        width[2] = (0, m - a.shape[2])
        return np.pad(a, width, mode="constant" if masked else "edge")

    out = {}
    for k in batches[0]:
        if k in ("point_coord", "point_value", "point_mask"):
            out[k] = np.stack(
                [pad_m(bb[k], masked=(k == "point_mask"))
                 for bb in batches])
        else:
            out[k] = np.stack([bb[k] for bb in batches])
    return out


def make_dp_sp_train_step(cfg, unet, imnet, pde_layer,
                          tx: optax.GradientTransformation,
                          n_data: int, n_space: int,
                          sharded_encoder: bool = False,
                          n_inner: int = 1):
    """Build (jitted 2-D-mesh step, mesh, place).

    Batch layout (global): lres [B, t, z, x, C] sharded on 'data'
    (and on 'space' along x when ``sharded_encoder``); point_coord
    [B, S, M, 3] sharded on ('data', 'space'); likewise point_value,
    point_mask. B % n_data == 0; latent x nodes % n_space == 0. State
    replicated.

    sharded_encoder: ``unet`` is a
    :class:`~space_time_pde_tpu.parallel.sharded_unet.ShardedUNet3d`
    (halo convs) consuming its own x-shard of the input — the full
    latent grid is never materialized on one device.

    n_inner > 1: every batch array gains a leading [n_inner] axis (see
    :func:`stack_dp_sp_batches`) and the step lax.scan-chains n_inner
    optimizer updates per dispatch — the same host-latency
    amortization as the single-device ``--inner_steps``, now on the
    2-D mesh (metrics are the last inner step's).
    """
    devs = np.asarray(jax.devices()[:n_data * n_space]).reshape(
        n_data, n_space)
    mesh = Mesh(devs, ("data", "space"))
    alpha = cfg.train.alpha_pde
    axes = ("data", "space")
    # Sharded encoder: lres [B, *igres, C] arrives sharded on its LAST
    # spatial axis (x) — rank-generic so ShardedUNet3d (igres 3-tuple)
    # and ShardedUNet4d (4-tuple) both work.
    lres_spec = (P("data", *([None] * (len(unet.igres) - 1)),
                   "space", None)
                 if sharded_encoder else P("data"))
    use_jet = (pde_layer is not None and alpha > 0
               and getattr(cfg.train, "pde_derivs", "jet") == "jet"
               and pde_layer.max_derivative_order() <= 2)

    def shard_step(state: TrainState, batch):
        def loss_fn(params):
            # The DIFFERENTIATED loss must stay LOCAL: with
            # check_vma=False the transpose of an in-graph psum is
            # another psum, which multiplies the replicated cotangent by
            # the device count (measured: every grad exactly 8x on a
            # 4x2 mesh). So the global count enters only as data (no
            # grad path), each device returns its local normalized
            # contribution, and grads are psum'd AFTER value_and_grad —
            # psum(local grads) is the exact gradient of the global
            # masked mean. Metrics psum only as aux (never on the grad
            # path).
            lres = batch["lres"]
            coords = batch["point_coord"][:, 0]   # [b_loc, M, 3]
            values = batch["point_value"][:, 0]
            mask = batch["point_mask"][:, 0]      # [b_loc, M]

            # BatchNorm mode: stats ride the state; the encoder apply
            # is mutable and the updated running stats return through
            # the aux dict (same "_batch_stats" protocol as
            # train.trainer). nn.BatchNorm's bn_axis_name already
            # pmean-syncs the batch statistics across the mesh, so the
            # returned stats are replica-identical — never psum them.
            new_stats = None

            def encode(module, inp):
                nonlocal new_stats
                if state.batch_stats is None:
                    return module.apply({"params": params["unet"]}, inp)
                out, uvars = module.apply(
                    {"params": params["unet"],
                     "batch_stats": state.batch_stats},
                    inp, train=True, mutable=["batch_stats"])
                new_stats = uvars["batch_stats"]
                return out

            if sharded_encoder:
                # Halo-conv encoder: lres arrives x-sharded; its output
                # IS the latent shard.
                latent_shard = encode(unet, lres)
                x_nodes = latent_shard.shape[-2] * n_space
            else:
                # Replicated encoder: every space-rank encodes the full
                # grid and slices its shard along the LAST spatial axis
                # (axis -2 of [b, *spatial, C] — 3-D and 4-D alike).
                latent = encode(unet, lres)
                x_nodes = latent.shape[-2]
                n_loc = x_nodes // n_space
                s = jax.lax.axis_index("space")
                latent_shard = jax.lax.dynamic_slice_in_dim(
                    latent, s * n_loc, n_loc, axis=latent.ndim - 2)
            decoder = lambda v: imnet.apply({"params": params["imnet"]}, v)
            fwd = lambda pts: sharded_query_local_implicit_grid(
                decoder, latent_shard, pts, "space", x_nodes)

            if use_jet:
                jet = sharded_query_jet(
                    decoder, latent_shard, coords, "space", x_nodes)
                pred = jet[0]
            else:
                jet = None
                pred = fwd(coords)
            cnt = jax.lax.psum(jnp.sum(mask), axes) + 1e-8  # data only
            err2 = jnp.sum(jnp.square(pred - values), axis=-1)
            reg_local = jnp.sum(err2 * mask) / (cnt * values.shape[-1])
            metrics = {"reg_loss": jax.lax.psum(reg_local, axes)}
            loss_local = reg_local
            if pde_layer is not None and alpha > 0:
                res = pde_layer(coords, fwd=fwd, jet=jet)
                pde_local = 0.0
                for name, r in res.items():
                    eq_local = jnp.sum(jnp.square(r) * mask) / cnt
                    metrics[f"pde/{name}"] = jax.lax.psum(eq_local, axes)
                    pde_local = pde_local + eq_local
                metrics["pde_loss"] = jax.lax.psum(pde_local, axes)
                loss_local = loss_local + alpha * pde_local
            metrics["loss"] = jax.lax.psum(loss_local, axes)
            if new_stats is not None:
                metrics["_batch_stats"] = new_stats
            return loss_local, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, axes)
        new_stats = metrics.pop("_batch_stats", state.batch_stats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=state.key,
                               batch_stats=new_stats)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if n_inner > 1:
        def stacked_step(state: TrainState, stacked):
            state, metrics = jax.lax.scan(shard_step, state, stacked)
            return state, jax.tree.map(lambda m: m[-1], metrics)
        body = stacked_step
        pre = (None,)  # leading scan axis is unsharded
    else:
        body = shard_step
        pre = ()

    lres_spec_b = P(*pre, *lres_spec)
    pts_spec_b = P(*pre, "data", "space")
    mapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), {"lres": lres_spec_b,
                        "point_coord": pts_spec_b,
                        "point_value": pts_spec_b,
                        "point_mask": pts_spec_b}),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state: TrainState, batch):
        return mapped(state, batch)

    def place(state: TrainState, batch):
        rep = NamedSharding(mesh, P())
        state = jax.tree.map(lambda x: jax.device_put(x, rep), state)
        placed = {
            "lres": jax.device_put(
                batch["lres"], NamedSharding(mesh, lres_spec_b)),
        }
        for k in ("point_coord", "point_value", "point_mask"):
            placed[k] = jax.device_put(
                batch[k], NamedSharding(mesh, pts_spec_b))
        return state, placed

    return step, mesh, place
