"""Fused Pallas TPU kernel for the derivative JET of the decode path.

Training's hot stack is ``ops/jet.py``: value + coordinate Jacobian +
Hessian of the local-implicit-grid decode, consumed by the PDE residual
loss (reference: ``src/pde.py``'s ``create_graph=True`` towers). The
pure-jnp jet already collapses the math into one primal + D tangent MLP
passes; this module fuses those passes — corner gather, primal chain,
all D tangent chains sharing the primal's LeakyReLU masks, multilinear
blend, and ONE head matmul over all jet blocks — into a single
``pallas_call`` with VMEM-resident activations, plus a hand-written
backward kernel (``jax.custom_vjp``) so the TRAINING step runs on the
Pallas path end to end.

Math (see ops/jet.py for the derivation; ImNet is piecewise-linear so
its in-cell second derivative is exactly zero):

    per corner-row r (R = NB * 2^D):
      xs   = feats @ Wx_feat + bcast(frac @ Wx_rel) + corner_bias
      h_0  = act(xs_0);  h_i = act(h_{i-1} @ Wh_i + xs_i)
      g^a_0 = m_0 * Wx_rel[a]_0;  g^a_i = m_i * (g^a_{i-1} @ Wh_i
                                                 + Wx_rel[a]_i)
    (m_i = act'(pre_i) — the tangent chains reuse the primal's masks;
    d rel_k / d frac = I for every corner so one tangent pass covers
    all corners.)

    blends commute through the linear head (sum_k w_k = 1 and all its
    frac-derivatives sum to 0):
      value   = (sum_k w_k h_k) @ W5 + b5
      jac_a   = (sum_k dw_ak h_k + w_k g^a_k) @ W5
      hess_ab = (sum_k d2w_abk h_k + dw_ak g^b_k + dw_bk g^a_k) @ W5

    so all 1 + D + D(D+1)/2 jet blocks stack into ONE [NB*10, nf] @ W5
    MXU matmul. Derivatives are in FRAC units; the caller rescales by
    d frac / d p (exactly like ops/jet.py).

Parity contract: equals ``ops.jet.decode_blend_jet`` to float tolerance
(``tests/test_fused_jet.py``, interpret mode on CPU + real TPU).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from space_time_pde_tpu.ops.fused_query import (
    _padded_widths,
    cell_major_features,
    pack_imnet_params,
)
from space_time_pde_tpu.ops.grid_interp import _locate, corner_offsets

__all__ = [
    "make_fused_jet",
    "fused_query_jet",
]

_PARAM_NAMES = ["wx_feat", "wx_rel", "corner_bias", "wh1", "wh2", "wh3",
                "wh4", "w5", "b5"]


def _tri_pairs(dim: int):
    return [(a, b) for a in range(dim) for b in range(a, dim)]


def _blend_weights(frac32, n_corners: int, dim: int, with_derivs: bool):
    """Multilinear weights (and frac-derivatives) from in-cell fracs.

    frac32 [NB, dim] f32 -> w [NB, K]; dw list[dim] of [NB, K];
    d2w dict[(a,b)] of [NB, K] (a < b; the diagonal is zero).
    Built from per-axis factors with static python loops (VPU ops).
    """
    offs = corner_offsets(dim)                                # [K, dim]
    per_axis = []                                             # [dim][K] cols
    for d in range(dim):
        fd = frac32[:, d:d + 1]                               # [NB, 1]
        per_axis.append([fd if offs[k, d] else 1.0 - fd
                         for k in range(n_corners)])
    sign = 2.0 * offs.astype(np.float32) - 1.0                # [K, dim]

    def prod_excl(k, excl):
        col = None
        for d in range(dim):
            if d in excl:
                continue
            col = per_axis[d][k] if col is None else col * per_axis[d][k]
        if col is None:
            col = jnp.ones_like(frac32[:, :1])
        return col

    w = jnp.concatenate([prod_excl(k, ()) for k in range(n_corners)], 1)
    if not with_derivs:
        return w, None, None
    dw = [jnp.concatenate([prod_excl(k, (a,)) * sign[k, a]
                           for k in range(n_corners)], 1)
          for a in range(dim)]
    d2w = {}
    for a in range(dim):
        for b in range(a + 1, dim):
            d2w[(a, b)] = jnp.concatenate(
                [prod_excl(k, (a, b)) * (sign[k, a] * sign[k, b])
                 for k in range(n_corners)], 1)
    return w, dw, d2w


def _axis_onehot(r: int, dim: int, dtype):
    """[dim*R, dim] block indicator: rows [a*R, (a+1)*R) -> e_a.

    The D tangent chains run STACKED as one [D*R, w] chain; the
    per-layer Wx_rel row injection becomes ``onehot @ wxr_slice`` — a
    tiny K=D matmul instead of a row-slice broadcast (which mosaic
    cannot lay out), and every chain matmul becomes one 3x-taller MXU
    call instead of D separate ones.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (dim * r, dim), 0) // r
    cols = jax.lax.broadcasted_iota(jnp.int32, (dim * r, dim), 1)
    return (rows == cols).astype(dtype)


def _rep(m, dim):
    """Tile a mask [R, w] to the stacked-chain layout [dim*R, w]."""
    return jnp.concatenate([m] * dim, axis=0)


def _forward_chains(feats, frac, wxf, wxr, cb, whs, *, widths, n_corners,
                    dim, negative_slope, compute_dtype):
    """Shared primal + tangent chain computation (fwd and bwd kernels).

    Returns (xs [R, S] compute-dtype, hs — post-activation per layer,
    gs — STACKED tangent post-chain per layer ([dim*R, w_i]; row block
    a is the d/d frac_a tangent), masks f32 list).
    """
    offs = np.cumsum([0] + list(widths))
    s_tot = int(offs[-1])
    ns = negative_slope

    nb = frac.shape[0]
    r = feats.shape[0]
    xs_f = jnp.dot(feats, wxf, preferred_element_type=jnp.float32)
    xs_r = jnp.dot(frac, wxr, preferred_element_type=jnp.float32)
    xs_rc = (jnp.broadcast_to(xs_r[:, None, :], (nb, n_corners, s_tot))
             + cb[None])
    xs = (xs_f + xs_rc.reshape(r, s_tot)).astype(compute_dtype)

    onehot = _axis_onehot(r, dim, compute_dtype)              # [DR, D]
    wxr_c = wxr.astype(compute_dtype)

    def inj(i):                                               # [DR, w_i]
        return jnp.dot(onehot, wxr_c[:, offs[i]:offs[i + 1]],
                       preferred_element_type=jnp.float32)

    pre = xs[:, offs[0]:offs[1]].astype(jnp.float32)
    mask = jnp.where(pre >= 0, 1.0, ns)
    h = pre * mask
    hs, masks = [h], [mask]
    gs = [_rep(mask, dim) * inj(0)]
    for i, wh in enumerate(whs):
        pre = (jnp.dot(hs[-1].astype(compute_dtype), wh,
                       preferred_element_type=jnp.float32)
               + xs[:, offs[i + 1]:offs[i + 2]].astype(jnp.float32))
        mask = jnp.where(pre >= 0, 1.0, ns)
        hs.append(pre * mask)
        masks.append(mask)
        gt = (jnp.dot(gs[-1].astype(compute_dtype), wh,
                      preferred_element_type=jnp.float32) + inj(i + 1))
        gs.append(_rep(mask, dim) * gt)
    return xs, hs, gs, masks


def _jet_fwd_kernel(feats_ref, frac_ref, wxf_ref, wxr_ref, cb_ref,
                    wh1_ref, wh2_ref, wh3_ref, wh4_ref, w5_ref, b5_ref,
                    out_ref, *, widths, n_corners, dim, negative_slope,
                    compute_dtype):
    feats = feats_ref[:].astype(compute_dtype)
    frac = frac_ref[:].astype(compute_dtype)
    nb = frac.shape[0]
    nf = widths[-1]

    _, hs, gs, _ = _forward_chains(
        feats, frac, wxf_ref[:], wxr_ref[:], cb_ref[:],
        (wh1_ref[:], wh2_ref[:], wh3_ref[:], wh4_ref[:]),
        widths=widths, n_corners=n_corners, dim=dim,
        negative_slope=negative_slope, compute_dtype=compute_dtype)

    frac32 = frac_ref[:].astype(jnp.float32)
    w, dw, d2w = _blend_weights(frac32, n_corners, dim, True)

    r = feats.shape[0]
    hb = hs[-1].reshape(nb, n_corners, nf)
    gb = [gs[-1][a * r:(a + 1) * r].reshape(nb, n_corners, nf)
          for a in range(dim)]

    def blend(coef, x):
        return jnp.sum(x * coef[:, :, None], axis=1)          # [NB, nf]

    blocks = [blend(w, hb)]                                   # value
    for a in range(dim):
        blocks.append(blend(dw[a], hb) + blend(w, gb[a]))     # jac_a
    for (a, b) in _tri_pairs(dim):
        acc = blend(dw[a], gb[b]) + blend(dw[b], gb[a])
        if a != b:
            acc = acc + blend(d2w[(a, b)], hb)
        blocks.append(acc)                                    # hess_ab

    stacked = jnp.concatenate(blocks, axis=0)                 # [NBLK*NB, nf]
    head = jnp.dot(stacked.astype(compute_dtype), w5_ref[:],
                   preferred_element_type=jnp.float32)        # [NBLK*NB, O]
    # Block-major output rows (value | jac_a... | hess_ab...): no
    # interleaving reshape — mosaic-friendly.
    out_ref[:] = jnp.concatenate([head[:nb] + b5_ref[:],      # b5: value only
                                  head[nb:]], axis=0)


def _jet_bwd_kernel(feats_ref, frac_ref, wxf_ref, wxr_ref, cb_ref,
                    wh1_ref, wh2_ref, wh3_ref, wh4_ref, w5_ref, b5_ref,
                    ybar_ref,
                    dfeats_ref, dwxf_ref, dwxr_ref, dcb_ref,
                    dwh1_ref, dwh2_ref, dwh3_ref, dwh4_ref,
                    dw5_ref, db5_ref, *, widths, n_corners, dim,
                    negative_slope, compute_dtype):
    """Reverse-mode of the jet w.r.t. feats and every packed parameter.

    Parameter grads ACCUMULATE across the sequential TPU grid: their
    BlockSpecs map every grid step to block 0, so the refs stay VMEM-
    resident; step 0 initializes them.
    """
    offs = np.cumsum([0] + list(widths))
    nf = widths[-1]
    feats = feats_ref[:].astype(compute_dtype)
    frac = frac_ref[:].astype(compute_dtype)
    nb = frac.shape[0]
    whs = (wh1_ref[:], wh2_ref[:], wh3_ref[:], wh4_ref[:])

    # Recompute the forward (VMEM-resident; cheaper than spilling).
    xs, hs, gs, masks = _forward_chains(
        feats, frac, wxf_ref[:], wxr_ref[:], cb_ref[:], whs,
        widths=widths, n_corners=n_corners, dim=dim,
        negative_slope=negative_slope, compute_dtype=compute_dtype)
    frac32 = frac_ref[:].astype(jnp.float32)
    w, dw, d2w = _blend_weights(frac32, n_corners, dim, True)
    r = feats.shape[0]
    hb = hs[-1].reshape(nb, n_corners, nf)
    gb = [gs[-1][a * r:(a + 1) * r].reshape(nb, n_corners, nf)
          for a in range(dim)]

    def blend(coef, x):
        return jnp.sum(x * coef[:, :, None], axis=1)

    pairs = _tri_pairs(dim)
    n_blk = 1 + dim + len(pairs)
    ybar_flat = ybar_ref[:]                                   # [NBLK*NB, O]
    ybar = [ybar_flat[i * nb:(i + 1) * nb] for i in range(n_blk)]

    # --- head backward -------------------------------------------------
    blocks = [blend(w, hb)]
    for a in range(dim):
        blocks.append(blend(dw[a], hb) + blend(w, gb[a]))
    for (a, b) in pairs:
        acc = blend(dw[a], gb[b]) + blend(dw[b], gb[a])
        if a != b:
            acc = acc + blend(d2w[(a, b)], hb)
        blocks.append(acc)
    stacked = jnp.concatenate(blocks, axis=0)                 # [NBLK*NB, nf]
    dw5 = jnp.dot(stacked.astype(compute_dtype).T.astype(compute_dtype),
                  ybar_flat.astype(compute_dtype),
                  preferred_element_type=jnp.float32)         # [nf, O]
    db5 = jnp.sum(ybar[0], axis=0, keepdims=True)             # [1, O]
    w5t = w5_ref[:].astype(compute_dtype).T                   # [O, nf]
    bars_flat = jnp.dot(ybar_flat.astype(compute_dtype), w5t.astype(
        compute_dtype), preferred_element_type=jnp.float32)   # [NBLK*NB, nf]
    bars = [bars_flat[i * nb:(i + 1) * nb] for i in range(n_blk)]

    # --- blend backward: corner-row bars for h and g^a ------------------
    bv = bars[0]
    bj = [bars[1 + a] for a in range(dim)]
    bh = {p: bars[1 + dim + i] for i, p in enumerate(pairs)}

    def spread(coef, x):
        # d blend / d corner-rows: [NB, nf] bar -> [NB, K, nf]
        return coef[:, :, None] * x[:, None, :]

    hbar = spread(w, bv)
    for a in range(dim):
        hbar = hbar + spread(dw[a], bj[a])
    gbar = [spread(w, bj[a]) for a in range(dim)]
    for (a, b) in pairs:
        if a != b:
            hbar = hbar + spread(d2w[(a, b)], bh[(a, b)])
        gbar[b] = gbar[b] + spread(dw[a], bh[(a, b)])
        gbar[a] = gbar[a] + spread(dw[b], bh[(a, b)])
    hbar = hbar.reshape(nb * n_corners, nf)
    gbar = [g.reshape(nb * n_corners, nf) for g in gbar]

    # --- chain backward --------------------------------------------------
    s_tot = int(offs[-1])
    xsbar_parts = [None] * 5                                  # per layer
    dwh = [None] * 4
    # Tangent Wx_rel-slice grads: onehot^T @ P collapses the stacked
    # chain back to per-axis row sums (mosaic has no in-kernel
    # scatter-add); assembled by concatenation over layers.
    segs = [None] * 5                                         # [D, w_i]
    onehot = _axis_onehot(r, dim, compute_dtype)              # [DR, D]

    hcur = hbar
    gcur = jnp.concatenate(gbar, axis=0)                      # [DR, nf]
    for i in range(4, 0, -1):
        m = masks[i]
        pv = hcur * m                                         # [R, w_i]
        xsbar_parts[i] = pv
        pt = gcur * _rep(m, dim)                              # [DR, w_i]
        acc = jnp.dot(
            hs[i - 1].astype(compute_dtype).T.astype(compute_dtype),
            pv.astype(compute_dtype),
            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(
            gs[i - 1].astype(compute_dtype).T.astype(compute_dtype),
            pt.astype(compute_dtype),
            preferred_element_type=jnp.float32)
        segs[i] = jnp.dot(onehot.T, pt.astype(compute_dtype),
                          preferred_element_type=jnp.float32)
        wht = whs[i - 1].T
        hcur = jnp.dot(pv.astype(compute_dtype), wht.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        gcur = jnp.dot(pt.astype(compute_dtype), wht.astype(compute_dtype),
                       preferred_element_type=jnp.float32)
        dwh[i - 1] = acc
    m0 = masks[0]
    xsbar_parts[0] = hcur * m0
    segs[0] = jnp.dot(onehot.T, (gcur * _rep(m0, dim)).astype(
        compute_dtype), preferred_element_type=jnp.float32)
    dwxr_t = jnp.concatenate(segs, axis=1)                    # [D, S]

    xsbar = jnp.concatenate(xsbar_parts, axis=1)              # [R, S] f32

    # --- input-projection backward --------------------------------------
    dfeats = jnp.dot(xsbar.astype(compute_dtype),
                     wxf_ref[:].astype(compute_dtype).T.astype(
                         compute_dtype),
                     preferred_element_type=jnp.float32)      # [R, C]
    dwxf = jnp.dot(feats.T.astype(compute_dtype),
                   xsbar.astype(compute_dtype),
                   preferred_element_type=jnp.float32)        # [C, S]
    xsb3 = xsbar.reshape(nb, n_corners, s_tot)
    xsb_pt = jnp.sum(xsb3, axis=1)                            # [NB, S]
    dwxr_v = jnp.dot(frac.T.astype(compute_dtype),
                     xsb_pt.astype(compute_dtype),
                     preferred_element_type=jnp.float32)      # [dim, S]
    dcb = jnp.sum(xsb3, axis=0)                               # [K, S]

    dfeats_ref[:] = dfeats.astype(dfeats_ref.dtype)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwxf_ref[:] = jnp.zeros_like(dwxf_ref)
        dwxr_ref[:] = jnp.zeros_like(dwxr_ref)
        dcb_ref[:] = jnp.zeros_like(dcb_ref)
        dwh1_ref[:] = jnp.zeros_like(dwh1_ref)
        dwh2_ref[:] = jnp.zeros_like(dwh2_ref)
        dwh3_ref[:] = jnp.zeros_like(dwh3_ref)
        dwh4_ref[:] = jnp.zeros_like(dwh4_ref)
        dw5_ref[:] = jnp.zeros_like(dw5_ref)
        db5_ref[:] = jnp.zeros_like(db5_ref)

    dwxf_ref[:] += dwxf
    dwxr_ref[:] += dwxr_v + dwxr_t
    dcb_ref[:] += dcb
    for ref, g in zip((dwh1_ref, dwh2_ref, dwh3_ref, dwh4_ref), dwh):
        ref[:] += g
    dw5_ref[:] += dw5
    db5_ref[:] += db5


def make_fused_jet(*, nf: int, n_corners: int, dim: int, out_dim: int,
                   negative_slope: float = 0.01, block_pts: int = 256,
                   compute_dtype=jnp.bfloat16, interpret: bool = False,
                   pad_to: int = 128, activation: str = "leaky_relu"):
    """Build the custom-VJP fused jet:

    ``jet(feats2 [N*K, C], frac [N, dim], packed) ->
    (value [N, O], jac [N, O, dim], hess [N, O, dim, dim])``
    (derivatives in frac units). Differentiable w.r.t. ``feats2`` and
    every packed parameter; ``frac`` receives zero cotangent (query
    coordinates are data, not trained — matching what the training loss
    needs; the COORDINATE derivatives are the jet outputs themselves).

    ``activation`` must be piecewise-linear (the jet math assumes zero
    in-cell second derivative); the kernel's two-branch mask covers both
    entries — ``relu`` is the slope-0 special case of ``leaky_relu``.
    """
    from space_time_pde_tpu.models.nonlinearities import PIECEWISE_LINEAR
    if activation not in PIECEWISE_LINEAR:
        raise ValueError(
            f"fused jet requires a piecewise-linear activation, got "
            f"{activation!r}; available: {sorted(PIECEWISE_LINEAR)}")
    if activation == "relu":
        negative_slope = 0.0
    # pad_to=128 keeps every per-layer xs/wxr column slice lane-aligned
    # (mosaic rejects broadcasts from offset slices); padded lanes carry
    # exact zeros through the jet AND its backward (zero weight
    # rows/cols), so results are bit-identical.
    widths = tuple(_padded_widths(nf, pad_to))
    pairs = _tri_pairs(dim)
    n_blk = 1 + dim + len(pairs)
    mspace = pl.ANY if interpret else pltpu.VMEM
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20)

    def _pad(feats2, frac):
        nk, c = feats2.shape
        n = nk // n_corners
        n_pad = (-n) % block_pts
        if n_pad:
            feats2 = jnp.pad(feats2, ((0, n_pad * n_corners), (0, 0)))
            frac = jnp.pad(frac, ((0, n_pad), (0, 0)))
        return feats2, frac, n, n + n_pad

    def _param_specs(packed):
        vals = [packed[p] for p in _PARAM_NAMES]
        specs = [pl.BlockSpec(p.shape, lambda i, nd=p.ndim: (0,) * nd,
                              memory_space=mspace) for p in vals]
        return vals, specs

    def _fwd_raw(feats2, frac, packed):
        feats2, frac, n, n_tot = _pad(feats2, frac)
        c = feats2.shape[-1]
        r = block_pts * n_corners
        vals, specs = _param_specs(packed)
        out = pl.pallas_call(
            functools.partial(
                _jet_fwd_kernel, widths=widths, n_corners=n_corners,
                dim=dim, negative_slope=negative_slope,
                compute_dtype=compute_dtype),
            grid=(n_tot // block_pts,),
            in_specs=[
                pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=mspace),
                pl.BlockSpec((block_pts, dim), lambda i: (i, 0),
                             memory_space=mspace),
                *specs,
            ],
            out_specs=pl.BlockSpec((n_blk * block_pts, out_dim),
                                   lambda i: (i, 0), memory_space=mspace),
            out_shape=jax.ShapeDtypeStruct((n_tot * n_blk, out_dim),
                                           jnp.float32),
            interpret=interpret,
            compiler_params=compiler_params,
        )(feats2, frac, *vals)
        return out

    def _unpack(out, n):
        # out rows: grid-block-major, block-major within: [G, NBLK, NB, O]
        out = out.reshape(-1, n_blk, block_pts, out_dim)
        out = jnp.moveaxis(out, 1, 0).reshape(n_blk, -1, out_dim)[:, :n]
        value = out[0]
        jac = jnp.stack([out[1 + a] for a in range(dim)], axis=-1)
        hess = jnp.zeros((n, out_dim, dim, dim), out.dtype)
        for i, (a, b) in enumerate(pairs):
            blk = out[1 + dim + i]
            hess = hess.at[:, :, a, b].set(blk)
            if a != b:
                hess = hess.at[:, :, b, a].set(blk)
        return value, jac, hess

    @jax.custom_vjp
    def jet(feats2, frac, packed):
        return _unpack(_fwd_raw(feats2, frac, packed), frac.shape[0])

    def jet_fwd(feats2, frac, packed):
        out = _unpack(_fwd_raw(feats2, frac, packed), frac.shape[0])
        return out, (feats2, frac, packed)

    def jet_bwd(res, cot):
        feats2, frac, packed = res
        vbar, jbar, hbar = cot
        n = frac.shape[0]
        # Repack cotangents into the kernel's [N, NBLK*O] layout; the
        # symmetric hess entries (a != b) were emitted once and mirrored,
        # so their cotangents add.
        blocks = [vbar] + [jbar[:, :, a] for a in range(dim)]
        for (a, b) in pairs:
            blk = hbar[:, :, a, b]
            if a != b:
                blk = blk + hbar[:, :, b, a]
            blocks.append(blk)

        feats2p, fracp, _, n_tot = _pad(feats2, frac)
        # Kernel layout: [G, NBLK, NB, O] flattened — block-major rows
        # within each grid block (mirrors the forward output).
        yb = jnp.stack(blocks, axis=0).astype(jnp.float32)    # [NBLK, n, O]
        yb = jnp.pad(yb, ((0, 0), (0, n_tot - n), (0, 0)))
        yb = yb.reshape(n_blk, -1, block_pts, out_dim)
        ybar_p = jnp.moveaxis(yb, 1, 0).reshape(n_tot * n_blk, out_dim)
        c = feats2p.shape[-1]
        r = block_pts * n_corners
        vals, specs = _param_specs(packed)
        grad_shapes = [jax.ShapeDtypeStruct(v.shape, jnp.float32)
                       for v in vals]
        grad_specs = [pl.BlockSpec(v.shape, lambda i, nd=v.ndim: (0,) * nd,
                                   memory_space=mspace) for v in vals]
        outs = pl.pallas_call(
            functools.partial(
                _jet_bwd_kernel, widths=widths, n_corners=n_corners,
                dim=dim, negative_slope=negative_slope,
                compute_dtype=compute_dtype),
            grid=(n_tot // block_pts,),
            in_specs=[
                pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=mspace),
                pl.BlockSpec((block_pts, dim), lambda i: (i, 0),
                             memory_space=mspace),
                *specs,
                pl.BlockSpec((n_blk * block_pts, out_dim),
                             lambda i: (i, 0), memory_space=mspace),
            ],
            out_specs=[
                pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=mspace),
                *grad_specs,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tot * n_corners, c), jnp.float32),
                *grad_shapes,
            ],
            interpret=interpret,
            compiler_params=compiler_params,
        )(feats2p, fracp, *vals, ybar_p)
        dfeats = outs[0][:n * n_corners].astype(feats2.dtype)
        dpacked = {name: g.astype(packed[name].dtype)
                   for name, g in zip(_PARAM_NAMES, outs[1:])}
        return dfeats, jnp.zeros_like(frac), dpacked

    jet.defvjp(jet_fwd, jet_bwd)
    return jet


def fused_query_jet(imnet, params, latent_grid, pts, xmin=0.0, xmax=1.0,
                    block_pts: int = 256, compute_dtype=jnp.bfloat16,
                    interpret: bool = False, pad_to: int = 128):
    """Drop-in fused version of ops.jet.query_local_implicit_grid_jet.

    latent_grid [B, *spatial, C]; pts [B, N, D] ->
    (value [B, N, O], jac [B, N, O, D], hess [B, N, O, D, D]) in pts
    units. Differentiable w.r.t. ``params`` and ``latent_grid`` (the
    gather backward is XLA's scatter-add; packing is plain jnp).
    """
    dim = pts.shape[-1]
    k = 2 ** dim
    packed = pack_imnet_params(
        params, imnet.dim, imnet.in_features, imnet.nf,
        dtype=compute_dtype, pad_to=pad_to)
    jet = make_fused_jet(
        nf=imnet.nf, n_corners=k, dim=dim, out_dim=imnet.out_features,
        negative_slope=imnet.negative_slope, block_pts=block_pts,
        compute_dtype=compute_dtype, interpret=interpret, pad_to=pad_to,
        activation=getattr(imnet, "activation", "leaky_relu"))

    b, n = pts.shape[0], pts.shape[1]
    c = latent_grid.shape[-1]

    def gather(grid, p):
        spatial = grid.shape[:-1]

        def floc(q):
            return _locate(q, spatial, xmin, xmax)[1]

        cell, frac = _locate(p, spatial, xmin, xmax)
        eye = jnp.eye(dim, dtype=p.dtype)
        dfrac = jnp.stack(
            [jax.jvp(floc, (p,), (jnp.broadcast_to(eye[a], p.shape),))[1]
             [..., a] for a in range(dim)], axis=-1)          # [N, D]

        cell_feats = cell_major_features(grid.astype(compute_dtype))
        cells_shape = [s - 1 for s in spatial]
        strides = np.ones(dim, dtype=np.int32)
        for a in range(dim - 2, -1, -1):
            strides[a] = strides[a + 1] * cells_shape[a + 1]
        cell_flat = jnp.sum(cell * jnp.asarray(strides), axis=-1)
        rows = jnp.take(cell_feats, cell_flat, axis=0)        # [N, K*C]
        return rows, frac, dfrac

    # Gather per batch element (latents differ), then run ONE kernel
    # over all B*N points — a single large grid instead of B vmapped
    # small ones.
    rows, frac, dfrac = jax.vmap(gather)(latent_grid, pts)
    feats2 = rows.reshape(b * n * k, c)
    value, jac_f, hess_f = jet(
        feats2, frac.reshape(b * n, dim).astype(jnp.float32), packed)
    dfrac32 = dfrac.reshape(b * n, dim).astype(value.dtype)
    jac = jac_f * dfrac32[:, None, :]
    hess = (hess_f * dfrac32[:, None, :, None]
            * dfrac32[:, None, None, :])
    out_dim = value.shape[-1]
    return (value.reshape(b, n, out_dim),
            jac.reshape(b, n, out_dim, dim),
            hess.reshape(b, n, out_dim, dim, dim))
