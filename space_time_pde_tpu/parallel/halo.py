"""Sharded latent grid + sharded queries with one-node halo exchange.

Scaling analog of sequence parallelism for this workload (the model has
no attention; the "long context" is a large latent grid and a huge
query-point set — see SURVEY.md §5): the latent context grid is sharded
along one spatial axis across a mesh axis, each device receives its
right neighbor's first node-plane via a ``ppermute`` ring (one hop over
ICI), and every device then queries ONLY the points that fall in its
own coordinate range using the ordinary local-implicit-grid machinery
with per-device domain bounds — cells straddling shard boundaries
resolve locally thanks to the halo.

The reference has no equivalent (its ``evaluation.py`` chunks dense
queries in a Python loop on one GPU); this is the TPU-native design for
BASELINE.json config #5 ("sharded latent grid + query batching across
v5p-32").

Correctness contract: the grid's sharded-axis node count must be
divisible by the mesh-axis size, and each device's points must lie in
its own range (use :func:`bin_points_by_shard`, or sample per-shard
points directly — uniform-in-shard sampling on every device IS uniform
global sampling when shards are equal).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.models import query_local_implicit_grid

__all__ = [
    "halo_exchange",
    "sharded_query_local_implicit_grid",
    "sharded_query_jet",
    "bin_points_by_shard",
    "shard_bounds",
]


def halo_exchange(latent_shard: jnp.ndarray, axis_name: str,
                  spatial_axis: int = -2) -> jnp.ndarray:
    """Append the right neighbor's first node-plane along spatial_axis.

    latent_shard: [..., n_loc, C] node-disjoint shard (device s holds
    global nodes [s*n_loc, (s+1)*n_loc)). Returns [..., n_loc + 1, C].

    The last device has no right neighbor; it receives its OWN last
    plane instead (duplicated node), which makes its phantom extra cell
    degenerate — queries clamped at the global upper bound resolve to
    the true boundary node exactly.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    ndim = latent_shard.ndim
    ax = spatial_axis % ndim

    first = jax.lax.slice_in_dim(latent_shard, 0, 1, axis=ax)
    last = jax.lax.slice_in_dim(
        latent_shard, latent_shard.shape[ax] - 1, latent_shard.shape[ax],
        axis=ax)
    # Ring: device s receives device (s+1)'s first plane.
    halo = jax.lax.ppermute(
        first, axis_name, perm=[(s, (s - 1) % n) for s in range(n)])
    halo = jnp.where(idx == n - 1, last, halo)
    return jnp.concatenate([latent_shard, halo], axis=ax)


def shard_bounds(axis_name: str, n_nodes_global: int,
                 xmin: float = 0.0, xmax: float = 1.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device (lo, hi) domain bounds along the sharded axis.

    Device s's local grid (with halo) spans global nodes
    [s*n_loc, s*n_loc + n_loc], i.e. coordinates
    xmin + (s*n_loc)/(N-1)*(xmax-xmin) .. xmin + (s*n_loc+n_loc)/(N-1)*...
    """
    n = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    assert n_nodes_global % n == 0, (
        f"sharded-axis nodes {n_nodes_global} not divisible by mesh {n}")
    n_loc = n_nodes_global // n
    span = (xmax - xmin) / (n_nodes_global - 1)
    lo = xmin + (s * n_loc) * span
    hi = xmin + (s * n_loc + n_loc) * span
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def sharded_query_local_implicit_grid(
    decoder_fn: Callable[[jnp.ndarray], jnp.ndarray],
    latent_shard: jnp.ndarray,
    pts_shard: jnp.ndarray,
    axis_name: str,
    n_nodes_global: int,
    xmin=0.0,
    xmax=1.0,
    spatial_axis: int = -2,
) -> jnp.ndarray:
    """Query a spatially-sharded latent grid (call inside shard_map).

    latent_shard: [B, ..., n_loc, C] (sharded axis second-to-last by
    default — the x axis of a [B, T, Z, X, C] grid); pts_shard:
    [B, N_loc, D] points INSIDE this device's coordinate range.
    xmin/xmax are the GLOBAL domain bounds (scalars or length-D).
    Returns [B, N_loc, out] — each device's values for its own points.
    """
    grid_loc, xmin_loc, xmax_loc = _halo_and_local_bounds(
        latent_shard, pts_shard, axis_name, n_nodes_global,
        xmin, xmax, spatial_axis)
    return query_local_implicit_grid(
        decoder_fn, grid_loc, pts_shard, xmin_loc, xmax_loc)


def sharded_query_jet(
    decoder_fn: Callable[[jnp.ndarray], jnp.ndarray],
    latent_shard: jnp.ndarray,
    pts_shard: jnp.ndarray,
    axis_name: str,
    n_nodes_global: int,
    xmin=0.0,
    xmax=1.0,
    spatial_axis: int = -2,
):
    """Analytic jet (value/jac/hess) of the sharded query.

    Same contract as :func:`sharded_query_local_implicit_grid`;
    derivatives are w.r.t. the GLOBAL normalized point coordinates
    (local bounds only relocate the cell math, not the units). Feeds
    the PDE layer's jet fast path inside the dp x space train step.
    """
    from space_time_pde_tpu.ops.jet import query_local_implicit_grid_jet

    grid_loc, xmin_loc, xmax_loc = _halo_and_local_bounds(
        latent_shard, pts_shard, axis_name, n_nodes_global,
        xmin, xmax, spatial_axis)
    return query_local_implicit_grid_jet(
        decoder_fn, grid_loc, pts_shard, xmin_loc, xmax_loc)


def _halo_and_local_bounds(latent_shard, pts_shard, axis_name,
                           n_nodes_global, xmin, xmax, spatial_axis):
    """Halo-extend the shard and compute per-device domain bounds."""
    grid_loc = halo_exchange(latent_shard, axis_name, spatial_axis)
    dim = pts_shard.shape[-1]
    # Per-device bounds along the sharded axis; global elsewhere.
    sa = spatial_axis % latent_shard.ndim
    coord_axis = sa - (latent_shard.ndim - 1 - dim)  # batch+channels offset
    lo, hi = shard_bounds(axis_name, n_nodes_global,
                          jnp.asarray(xmin, jnp.float32) if np.ndim(xmin) == 0
                          else jnp.asarray(xmin)[coord_axis],
                          jnp.asarray(xmax, jnp.float32) if np.ndim(xmax) == 0
                          else jnp.asarray(xmax)[coord_axis])
    xmin_v = jnp.broadcast_to(jnp.asarray(xmin, jnp.float32), (dim,))
    xmax_v = jnp.broadcast_to(jnp.asarray(xmax, jnp.float32), (dim,))
    xmin_loc = xmin_v.at[coord_axis].set(lo)
    xmax_loc = xmax_v.at[coord_axis].set(hi)
    return grid_loc, xmin_loc, xmax_loc


def bin_points_by_shard(pts: np.ndarray, n_shards: int,
                        n_nodes_global: int, coord_axis: int = 2,
                        xmin: float = 0.0, xmax: float = 1.0
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side routing of arbitrary points to grid shards.

    Returns (binned [n_shards, M, D], mask [n_shards, M], inverse
    permutation to restore original order from the concatenated valid
    outputs). M = max bin count (bins padded with their first point so
    padded queries are valid; mask selects real outputs).
    """
    n = pts.shape[0]
    n_loc = n_nodes_global // n_shards
    span = (xmax - xmin) / (n_nodes_global - 1)
    x = pts[:, coord_axis]
    cellf = np.clip((x - xmin) / span, 0, n_nodes_global - 1 - 1e-6)
    shard = np.clip((cellf // n_loc).astype(int), 0, n_shards - 1)
    order = np.argsort(shard, kind="stable")
    counts = np.bincount(shard, minlength=n_shards)
    m = int(counts.max()) if n else 1
    binned = np.zeros((n_shards, m, pts.shape[1]), pts.dtype)
    mask = np.zeros((n_shards, m), bool)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for s in range(n_shards):
        sel = order[starts[s]:starts[s] + counts[s]]
        binned[s, :counts[s]] = pts[sel]
        if counts[s] < m and counts[s] > 0:
            binned[s, counts[s]:] = pts[sel[0]]
        elif counts[s] == 0:
            binned[s, :] = xmin
        mask[s, :counts[s]] = True
    inverse = np.argsort(order, kind="stable")
    return binned, mask, inverse
