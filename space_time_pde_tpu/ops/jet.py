"""Analytic derivative "jet" of the local-implicit-grid query.

The PDE residual loss needs first- and second-order derivatives of the
decoded field w.r.t. the query coordinates (reference:
``src/pde.py::PDELayer`` builds ``torch.autograd.grad(...,
create_graph=True)`` towers at runtime; our ``physics/pde.py`` compiles
them to nested-jvp towers). Either way, every derivative multi-index
re-propagates tangents through the full gather + 2^D-corner MLP stack —
for the RB2D system that is ~15 MLP-equivalent passes per step, and the
XLA graph fragments into hundreds of small fusions (measured round 1:
8.7 ms/step on a v5e at B=8/512 pts).

This module exploits the model's analytic structure instead. The decoded
field is

    pred(p) = sum_c  w_c(f) * M(rel_c(f), feats_c),      f = frac(p)

where ``w_c`` is multilinear in ``f``, ``rel_c = f - offset_c`` is
linear, the corner features are piecewise-constant, and the ImNet MLP
``M`` is piecewise-LINEAR in its coordinate inputs (LeakyReLU): under
autodiff its second coordinate derivative is exactly zero (the
activation's second derivative is zero everywhere, including at the
kink, by the standard ``where``-rule). Hence with per-corner values
``v_c = M(...)`` and coordinate Jacobians ``J_c = dM/drel``:

    d_a  pred = sum_c [ (d_a w_c) v_c + w_c J_c[:, a] ]          * s_a
    d_ab pred = sum_c [ (d_ab w_c) v_c + (d_a w_c) J_c[:, b]
                        + (d_b w_c) J_c[:, a] ]                  * s_a s_b

(``s_a`` = d frac_a / d p_a, a constant per axis away from the domain
boundary; ``d_aa w_c = 0`` since ``w_c`` is multilinear, so the one
symmetric formula covers pure and cross terms). ONE primal MLP pass plus
``D`` tangent passes produce the entire jet — value, gradient, and full
coordinate Hessian — in a handful of large MXU matmuls.

Everything here is pure jnp, so the jet remains differentiable w.r.t.
parameters and the latent grid (the training backward pass is ordinary
XLA reverse-mode through these matmuls).

Exactness contract (tested in ``tests/test_jet.py``): for decoders that
are piecewise-linear in their first ``D`` inputs, the jet equals the
nested-jvp towers through :func:`models.query_local_implicit_grid` to
float tolerance, including the clamp semantics at the domain boundary
(``s_a`` is computed by jvp through the same ``_locate`` clamp).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.ops.grid_interp import (
    _locate,
    corner_offsets,
    gather_corner_feats,
)

__all__ = [
    "multilinear_weight_jet",
    "decode_blend_jet",
    "query_local_implicit_grid_jet",
]


def multilinear_weight_jet(frac: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Multilinear corner weights and their frac-derivatives.

    frac: ``[N, D]`` in-cell fractions ->
      w   ``[N, K]``        weights (K = 2^D, order = corner_offsets),
      dw  ``[N, K, D]``     d w / d frac_a,
      d2w ``[N, K, D, D]``  d^2 w / d frac_a d frac_b (zero diagonal —
                            w is multilinear).
    """
    dim = frac.shape[-1]
    offs = corner_offsets(dim)                              # [K, D] static
    offs_f = jnp.asarray(offs, frac.dtype)
    sign = jnp.asarray(2 * offs - 1, frac.dtype)            # [K, D]
    per_axis = jnp.where(offs_f[None], frac[:, None, :],
                         1.0 - frac[:, None, :])            # [N, K, D]
    w = jnp.prod(per_axis, axis=-1)                         # [N, K]

    def prod_excluding(excl):
        keep = [d for d in range(dim) if d not in excl]
        if not keep:
            return jnp.ones(per_axis.shape[:-1], frac.dtype)
        return jnp.prod(per_axis[..., keep], axis=-1)

    dw = jnp.stack([prod_excluding((a,)) * sign[None, :, a]
                    for a in range(dim)], axis=-1)          # [N, K, D]
    rows = []
    for a in range(dim):
        cols = []
        for b in range(dim):
            if a == b:
                cols.append(jnp.zeros(w.shape, frac.dtype))
            else:
                cols.append(prod_excluding((a, b))
                            * sign[None, :, a] * sign[None, :, b])
        rows.append(jnp.stack(cols, axis=-1))
    d2w = jnp.stack(rows, axis=-2)                          # [N, K, D, D]
    return w, dw, d2w


def decode_blend_jet(
    decoder_fn: Callable[[jnp.ndarray], jnp.ndarray],
    feats: jnp.ndarray,
    frac: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Jet of the decode+blend stage in frac units.

    feats: ``[N, K, C]`` corner features (constant w.r.t. coords);
    frac: ``[N, D]`` in-cell fractions. Returns
    (value ``[N, O]``, jac ``[N, O, D]``, hess ``[N, O, D, D]``) —
    derivatives w.r.t. ``frac`` (rescale by d frac/d p outside).

    decoder_fn must be piecewise-linear in its first D inputs (ImNet
    with LeakyReLU/ReLU); its in-cell second derivative is then exactly
    zero and the Hessian reduces to multilinear-weight cross terms.
    """
    dim = frac.shape[-1]
    offs_f = jnp.asarray(corner_offsets(dim), frac.dtype)
    rel = frac[:, None, :] - offs_f[None]                   # [N, K, D]

    def dec_rel(r):
        return decoder_fn(jnp.concatenate([r, feats], axis=-1))

    # One primal pass + D tangent passes (linearize shares the primal).
    value_c, lin = jax.linearize(dec_rel, rel)              # [N, K, O]
    eye = jnp.eye(dim, dtype=rel.dtype)
    jac_c = jnp.stack(
        [lin(jnp.broadcast_to(eye[a], rel.shape)) for a in range(dim)],
        axis=-1)                                            # [N, K, O, D]

    w, dw, d2w = multilinear_weight_jet(frac)
    w = w.astype(value_c.dtype)
    dw = dw.astype(value_c.dtype)
    d2w = d2w.astype(value_c.dtype)

    value = jnp.einsum("nko,nk->no", value_c, w)
    jac = (jnp.einsum("nko,nka->noa", value_c, dw)
           + jnp.einsum("nkoa,nk->noa", jac_c, w))
    hess = (jnp.einsum("nko,nkab->noab", value_c, d2w)
            + jnp.einsum("nkob,nka->noab", jac_c, dw)
            + jnp.einsum("nkoa,nkb->noab", jac_c, dw))
    return value, jac, hess


def query_local_implicit_grid_jet(
    decoder_fn: Callable[[jnp.ndarray], jnp.ndarray],
    latent_grid: jnp.ndarray,
    pts: jnp.ndarray,
    xmin=0.0,
    xmax=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Value + coordinate Jacobian + Hessian of the implicit field.

    Same arguments as :func:`models.query_local_implicit_grid`
    (latent_grid ``[B, *spatial, C]``, pts ``[B, N, D]``); returns
    (value ``[B, N, O]``, jac ``[B, N, O, D]``, hess
    ``[B, N, O, D, D]``) — derivatives w.r.t. the ``pts`` units, ready
    for :meth:`physics.pde.PDELayer` consumption.
    """
    dim = pts.shape[-1]
    if latent_grid.ndim != dim + 2:
        raise ValueError(
            f"latent_grid rank {latent_grid.ndim} incompatible with "
            f"pts dim {dim}; expected [B, *spatial({dim}), C]")
    if dim >= 4 and jax.devices()[0].platform not in ("cpu", "interpret"):
        # Same XLA:TPU compiler segfault as the value-only jnp query
        # (see models/local_implicit_grid.py and BASELINE.md config #5).
        raise NotImplementedError(
            "query_local_implicit_grid_jet with dim >= 4 crashes this "
            "environment's XLA:TPU compiler; use the fused Pallas jet "
            "(ops.fused_jet.fused_query_jet) on TPU, or run on CPU.")

    def _single(grid, p):
        spatial = grid.shape[:-1]

        def floc(q):
            return _locate(q, spatial, xmin, xmax)[1]

        cell, frac = _locate(p, spatial, xmin, xmax)
        # d frac_a / d p_a including the domain-boundary clamp, computed
        # by jvp through the same clamp so towers and jet agree exactly.
        eye = jnp.eye(dim, dtype=p.dtype)
        dfrac = jnp.stack(
            [jax.jvp(floc, (p,), (jnp.broadcast_to(eye[a], p.shape),))[1]
             [..., a] for a in range(dim)], axis=-1)        # [N, D]

        feats = gather_corner_feats(grid, cell)             # [N, K, C]
        value, jac_f, hess_f = decode_blend_jet(decoder_fn, feats, frac)
        dfrac = dfrac.astype(value.dtype)
        jac = jac_f * dfrac[:, None, :]
        hess = hess_f * dfrac[:, None, :, None] * dfrac[:, None, None, :]
        return value, jac, hess

    return jax.vmap(_single)(latent_grid, pts)
