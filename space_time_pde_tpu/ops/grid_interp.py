"""Regular N-d grid multilinear interpolation — the L0 numerical core.

TPU-native equivalent of the reference's
``src/regular_nd_grid_interpolation.py`` (functions
``regular_nd_grid_interpolation_coefficients`` /
``regular_nd_grid_interpolation``): for continuous query points inside a
regular grid, locate the enclosing cell, gather the ``2**D`` corner
feature vectors, and produce per-corner multilinear weights and signed
relative coordinates (the inputs the ImNet decoder consumes).

Design notes (TPU-first):
- channels-LAST layout ``[*spatial, C]`` so the feature axis is the
  minor (lane) dimension — gathers move contiguous ``C``-vectors and
  downstream matmuls need no transpose;
- the corner-offset enumeration is a *static* ``(2**D, D)`` numpy array,
  so everything jit-traces to one fused XLA gather + elementwise blend
  with no Python-level data-dependent control flow;
- all index math is int32 (TPU scalar unit native width);
- query points are clamped to the grid domain (same out-of-range
  semantics as the reference: clamp to the boundary cell);
- everything is differentiable w.r.t. ``pts`` — derivatives flow through
  the weights and relative coordinates while the gathered corner values
  are piecewise-constant per cell, matching the reference's autograd
  semantics (the implicit field is C0 across cell faces, smooth inside).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "corner_offsets",
    "gather_corner_feats",
    "grid_interp_coefficients",
    "multilinear_interp",
]


@functools.lru_cache(maxsize=None)
def corner_offsets(dim: int) -> np.ndarray:
    """Static ``(2**dim, dim)`` array of cell-corner offsets in {0,1}.

    Ordering is lexicographic with the last axis fastest, e.g. for
    dim=2: (0,0), (0,1), (1,0), (1,1).
    """
    grid = np.indices((2,) * dim).reshape(dim, -1).T
    return np.ascontiguousarray(grid.astype(np.int32))


def _locate(pts, spatial, xmin, xmax):
    """Map points in ``[xmin, xmax]`` to (cell index, in-cell fraction).

    pts: [..., D] continuous coordinates.
    spatial: static tuple of D grid sizes (number of NODES per axis).
    Returns (cell [..., D] int32, frac [..., D] float) with
    cell in [0, n-2] and frac in [0, 1].
    """
    dim = len(spatial)
    sizes = jnp.asarray(spatial, dtype=pts.dtype)
    xmin = jnp.broadcast_to(jnp.asarray(xmin, dtype=pts.dtype), (dim,))
    xmax = jnp.broadcast_to(jnp.asarray(xmax, dtype=pts.dtype), (dim,))
    # Continuous grid coordinate in [0, n-1]; clamp out-of-domain points.
    s = (pts - xmin) / (xmax - xmin) * (sizes - 1.0)
    s = jnp.clip(s, 0.0, sizes - 1.0)
    cell = jnp.clip(jnp.floor(s).astype(jnp.int32), 0,
                    jnp.asarray(spatial, jnp.int32) - 2)
    frac = s - cell.astype(pts.dtype)
    return cell, frac


def gather_corner_feats(grid, cell):
    """Gather the ``2**D`` corner feature vectors of each cell.

    grid: ``[*spatial, C]``; cell: ``[N, D]`` int32 cell indices in
    ``[0, n_d - 2]`` -> ``[N, 2**D, C]`` (corner order matches
    :func:`corner_offsets`).
    """
    spatial = grid.shape[:-1]
    dim = len(spatial)
    offs = jnp.asarray(corner_offsets(dim))                 # [K, D] static
    corner_idx = cell[:, None, :] + offs[None, :, :]        # [N, K, D]
    # Flatten to 1-d gather: strides are static.
    strides = np.ones(dim, dtype=np.int32)
    for a in range(dim - 2, -1, -1):
        strides[a] = strides[a + 1] * spatial[a + 1]
    flat_idx = jnp.sum(corner_idx * jnp.asarray(strides), axis=-1)  # [N, K]
    flat_grid = grid.reshape(-1, grid.shape[-1])            # [prod, C]
    return jnp.take(flat_grid, flat_idx, axis=0)            # [N, K, C]


def grid_interp_coefficients(grid, pts, xmin=0.0, xmax=1.0):
    """Corner latents, multilinear weights, and relative coords for pts.

    Args:
      grid: ``[*spatial, C]`` feature grid (D spatial axes, channels last).
      pts:  ``[N, D]`` continuous query points in ``[xmin, xmax]^D``.
      xmin, xmax: scalar or length-D domain bounds per axis.

    Returns:
      corner_feats: ``[N, 2**D, C]`` features at the 2^D enclosing-cell
        corners (piecewise-constant w.r.t. ``pts`` inside a cell).
      weights: ``[N, 2**D]`` multilinear blending weights (sum to 1).
      rel_coords: ``[N, 2**D, D]`` signed offset of the query point from
        each corner in cell-local units: ``frac - offset`` in [-1, 1].

    Reference parity: ``src/regular_nd_grid_interpolation.py::
    regular_nd_grid_interpolation_coefficients``.
    """
    spatial = grid.shape[:-1]
    dim = len(spatial)
    if pts.shape[-1] != dim:
        raise ValueError(
            f"pts last dim {pts.shape[-1]} != grid spatial rank {dim}")
    cell, frac = _locate(pts, spatial, xmin, xmax)
    corner_feats = gather_corner_feats(grid, cell)          # [N, K, C]

    offs_f = jnp.asarray(corner_offsets(dim)).astype(frac.dtype)
    # weight = prod_d (offset ? frac : 1 - frac)
    per_axis = jnp.where(offs_f[None], frac[:, None, :], 1.0 - frac[:, None, :])
    weights = jnp.prod(per_axis, axis=-1)                   # [N, K]
    rel_coords = frac[:, None, :] - offs_f[None]            # [N, K, D]
    return corner_feats, weights, rel_coords


def multilinear_interp(grid, pts, xmin=0.0, xmax=1.0):
    """Plain multilinear interpolation of ``grid`` at ``pts``.

    grid: ``[*spatial, C]``; pts: ``[N, D]`` -> ``[N, C]``.

    Reference parity: ``src/regular_nd_grid_interpolation.py::
    regular_nd_grid_interpolation`` (also the mechanism behind the
    dataset's scipy ``RegularGridInterpolator`` ground-truth reads).
    """
    corner_feats, weights, _ = grid_interp_coefficients(grid, pts, xmin, xmax)
    return jnp.einsum("nkc,nk->nc", corner_feats, weights)
