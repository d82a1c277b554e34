"""Local Implicit Grid query — continuous space-time decoding.

TPU-native equivalent of the reference's
``src/local_implicit_grid.py::query_local_implicit_grid``: for each
continuous query point, gather the 2**D corner latents of its enclosing
cell, evaluate the ImNet decoder once per corner on
``[signed relative coord ⊕ corner latent]``, and blend the 2**D decoder
outputs with the multilinear weights.

The whole path is pure jnp (one XLA fusion: gather + batched matmuls +
blend) and is fully differentiable w.r.t. ``pts`` — the property the
PDE residual layer relies on. A fused Pallas kernel for the decode+blend
hot loop lives in ``ops/fused_query.py``; this module is the always-
available fallback and the kernel's parity oracle.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from space_time_pde_tpu.ops.grid_interp import grid_interp_coefficients

__all__ = ["query_local_implicit_grid"]


def query_local_implicit_grid(
    decoder_fn: Callable[[jnp.ndarray], jnp.ndarray],
    latent_grid: jnp.ndarray,
    pts: jnp.ndarray,
    xmin=0.0,
    xmax=1.0,
) -> jnp.ndarray:
    """Evaluate the implicit field at continuous points.

    Args:
      decoder_fn: maps ``[..., D + C] -> [..., out]`` (e.g. a bound
        ``ImNet.apply``); must accept arbitrary leading batch dims.
      latent_grid: ``[B, *spatial, C]`` latent context grid (channels
        last; D = len(spatial)).
      pts: ``[B, N, D]`` continuous query points in ``[xmin, xmax]^D``.
      xmin, xmax: scalar or length-D domain bounds.

    Returns:
      ``[B, N, out]`` decoded field values.

    Reference parity: ``src/local_implicit_grid.py::
    query_local_implicit_grid`` (same gather/decode/blend semantics;
    the reference flattens to ``B*N*2^D`` rows before the MLP — XLA does
    the equivalent reshape for the MXU automatically).
    """
    dim = pts.shape[-1]
    if latent_grid.ndim != dim + 2:
        raise ValueError(
            f"latent_grid rank {latent_grid.ndim} incompatible with "
            f"pts dim {dim}; expected [B, *spatial({dim}), C]")
    if dim >= 4 and jax.devices()[0].platform not in ("cpu", "interpret"):
        # The 16-corner gather/blend program reproducibly SEGFAULTS
        # this environment's XLA:TPU compiler (bisected round 2 — see
        # BASELINE.md config #5 notes; UNet4d and the fused 4-D Pallas
        # kernels compile fine). Fail loudly instead of taking the
        # whole process down inside the compiler.
        raise NotImplementedError(
            "query_local_implicit_grid with dim >= 4 crashes this "
            "environment's XLA:TPU compiler; use the fused Pallas path "
            "(ops.fused_query.fused_query_local_implicit_grid) on TPU, "
            "or run this jnp path on CPU.")

    def _single(grid, p):
        feats, weights, rel = grid_interp_coefficients(grid, p, xmin, xmax)
        inp = jnp.concatenate([rel, feats], axis=-1)       # [N, K, D+C]
        out = decoder_fn(inp)                              # [N, K, out]
        return jnp.einsum("nko,nk->no", out,
                          weights.astype(out.dtype))       # [N, out]

    return jax.vmap(_single)(latent_grid, pts)
