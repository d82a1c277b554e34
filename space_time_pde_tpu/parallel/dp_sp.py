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
    bin_points_by_shard,
    sharded_query_local_implicit_grid,
)
from space_time_pde_tpu.train.trainer import TrainState

__all__ = ["make_dp_sp_train_step", "make_dp_sp_batch"]


def make_dp_sp_batch(batch: Dict[str, np.ndarray], n_space: int,
                     n_nodes_x: int) -> Dict[str, np.ndarray]:
    """Bin each sample's points by x-shard; pad ragged bins + mask.

    In: point_coord [B, N, 3], point_value [B, N, V], lres [B, ...].
    Out: point_coord [B, S, M, 3], point_value [B, S, M, V],
    point_mask [B, S, M]; lres unchanged.
    """
    coords = batch["point_coord"]
    values = batch["point_value"]
    b = coords.shape[0]
    per_sample = []
    for i in range(b):
        binned, mask, inverse = bin_points_by_shard(
            coords[i], n_space, n_nodes_x, coord_axis=2)
        # Route values through the same permutation (argsort by shard).
        m = binned.shape[1]
        v = np.zeros((n_space, m, values.shape[-1]), values.dtype)
        order = np.argsort(inverse, kind="stable")  # original -> sorted
        vs = values[i][order]
        starts = np.concatenate([[0], np.cumsum(mask.sum(1))[:-1]])
        for s in range(n_space):
            c = int(mask[s].sum())
            v[s, :c] = vs[starts[s]:starts[s] + c]
        per_sample.append((binned, v, mask))
    m_max = max(p[0].shape[1] for p in per_sample)

    def pad(a, m):
        return np.pad(a, [(0, 0), (0, m - a.shape[1])] +
                      [(0, 0)] * (a.ndim - 2))

    out = dict(batch)
    out["point_coord"] = np.stack([pad(p[0], m_max) for p in per_sample])
    out["point_value"] = np.stack([pad(p[1], m_max) for p in per_sample])
    out["point_mask"] = np.stack(
        [pad(p[2].astype(np.float32), m_max) for p in per_sample])
    return out


def make_dp_sp_train_step(cfg, unet, imnet, pde_layer,
                          tx: optax.GradientTransformation,
                          n_data: int, n_space: int,
                          sharded_encoder: bool = False):
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
    """
    devs = np.asarray(jax.devices()[:n_data * n_space]).reshape(
        n_data, n_space)
    mesh = Mesh(devs, ("data", "space"))
    alpha = cfg.train.alpha_pde
    axes = ("data", "space")
    lres_spec = (P("data", None, None, "space", None)
                 if sharded_encoder else P("data"))

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

            if sharded_encoder:
                # Halo-conv encoder: lres arrives x-sharded; its output
                # IS the latent shard.
                latent_shard = unet.apply({"params": params["unet"]}, lres)
                x_nodes = latent_shard.shape[3] * n_space
            else:
                # Replicated encoder: every space-rank encodes the full
                # grid and slices its shard.
                latent = unet.apply({"params": params["unet"]}, lres)
                x_nodes = latent.shape[3]
                n_loc = x_nodes // n_space
                s = jax.lax.axis_index("space")
                latent_shard = jax.lax.dynamic_slice_in_dim(
                    latent, s * n_loc, n_loc, axis=3)
            decoder = lambda v: imnet.apply({"params": params["imnet"]}, v)
            fwd = lambda pts: sharded_query_local_implicit_grid(
                decoder, latent_shard, pts, "space", x_nodes)

            pred = fwd(coords)
            cnt = jax.lax.psum(jnp.sum(mask), axes) + 1e-8  # data only
            err2 = jnp.sum(jnp.square(pred - values), axis=-1)
            reg_local = jnp.sum(err2 * mask) / (cnt * values.shape[-1])
            metrics = {"reg_loss": jax.lax.psum(reg_local, axes)}
            loss_local = reg_local
            if pde_layer is not None and alpha > 0:
                res = pde_layer(coords, fwd=fwd)
                pde_local = 0.0
                for name, r in res.items():
                    eq_local = jnp.sum(jnp.square(r) * mask) / cnt
                    metrics[f"pde/{name}"] = jax.lax.psum(eq_local, axes)
                    pde_local = pde_local + eq_local
                metrics["pde_loss"] = jax.lax.psum(pde_local, axes)
                loss_local = loss_local + alpha * pde_local
            metrics["loss"] = jax.lax.psum(loss_local, axes)
            return loss_local, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, axes)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=state.key)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    mapped = jax.shard_map(
        shard_step, mesh=mesh,
        in_specs=(P(), {"lres": lres_spec,
                        "point_coord": P("data", "space"),
                        "point_value": P("data", "space"),
                        "point_mask": P("data", "space")}),
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
                batch["lres"], NamedSharding(mesh, lres_spec)),
        }
        for k in ("point_coord", "point_value", "point_mask"):
            placed[k] = jax.device_put(
                batch[k], NamedSharding(mesh, P("data", "space")))
        return state, placed

    return step, mesh, place
