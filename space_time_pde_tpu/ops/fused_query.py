"""Fused Pallas TPU kernel for the local-implicit-grid decode hot loop.

The reference's hottest path (``src/local_implicit_grid.py``: 8 ImNet
MLP evaluations + multilinear blend per query point) has two TPU
bottlenecks when composed from stock ops:

1. the corner gather: 2**D random 128-byte row reads per point — far
   below the HBM access granularity sweet spot (measured ~60x off
   bandwidth, as slow as the entire MLP);
2. per-corner hidden activations spilling to HBM (at 32k points the
   first hidden layer alone is 32k x 8 x 512 values per step).

This module fixes both:

- **cell-major pre-gather**: the latent grid is re-laid-out once per
  grid as ``cell_feats[n_cells, 8*C]`` via 8 *structured* shifted-slice
  copies (sequential HBM traffic). Each query point then gathers ONE
  contiguous ~1 KB row — 8x fewer random accesses at 8x the
  granularity. The reshape ``[N, 8C] -> [N*8, C]`` is a free row-major
  view.

- **fused decode+blend Pallas kernel** keeping ALL activations in VMEM:
    per block of NB points (R = NB*2^D corner rows):
    1. xs = feats @ Wx_feat  +  expand(frac @ Wx_rel + corner_bias)
       [R, 31*nf] — the IM-NET "input re-concatenated into every hidden
       layer" topology means each layer's pre-activation is
       h @ Wh_i + x @ Wx_i + b_i: all five latent projections fuse into
       one MXU matmul sliced per layer, and because
       rel_k = frac - offset_k the coordinate projections factor into
       an NB-row matmul plus per-corner constants
       corner_bias[k] = b_all - offset_k @ Wx_rel (8x fewer rows on the
       K-padded dim-D matmul; measured 26% faster);
    2. h <- leaky_relu(h @ Wh_i + xs_slice_i)  (f32 accumulate, bf16
       operands on TPU);
    3. multilinear weights derived from frac in-kernel, and the blend
       moved BEFORE the output layer: the final layer is linear and the
       weights sum to 1, so
       sum_k w_k (h_k @ W5 + b5) == (sum_k w_k h_k) @ W5 + b5.

Measured (1x v5e, 32k points, nf=32): 25.1M query points/s end to end
with the in-kernel gather (sorted-points kernel path 26.4M ≈ 45% of
bf16 peak at 3.4 MFLOP/point) — see BASELINE.md for the roofline and
the optimization history.

The pure-jnp path (models/local_implicit_grid.py) remains the parity
oracle; this kernel is the inference/eval fast path. The TRAINING hot
path runs its own custom-VJP Pallas kernel pair — the derivative jet
in ops/fused_jet.py (value + coordinate Jacobian/Hessian + backward).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from space_time_pde_tpu.ops.grid_interp import _locate, corner_offsets

__all__ = [
    "pack_imnet_params",
    "cell_major_features",
    "corner_tables",
    "fused_decode_blend",
    "fused_decode_blend_gather",
    "fused_query_local_implicit_grid",
]

_MULTS = (16, 8, 4, 2, 1)


def _padded_widths(nf: int, pad_to: int) -> list:
    return [max(nf * m, ((nf * m + pad_to - 1) // pad_to) * pad_to)
            if pad_to else nf * m for m in _MULTS]


def pack_imnet_params(params: Dict[str, Any], dim: int, in_features: int,
                      nf: int, dtype=jnp.bfloat16,
                      pad_to: int = 0) -> Dict[str, jnp.ndarray]:
    """Repack flax ImNet params for the fused kernel.

    ImNet layer i>=1 consumes concat([h, x]) so its kernel rows split as
    [prev_width rows of Wh | din rows of Wx]; the Wx block further
    splits into coordinate rows (first ``dim``) and latent rows. With
    ``pad_to`` (128 on TPU), every hidden width is zero-padded up to a
    lane-aligned multiple: padded bias/weight columns are zero, so the
    extra lanes carry exact zeros through leaky_relu and multiply into
    zero weight rows downstream — results are bit-identical while every
    xs slice offset and matmul dimension is MXU/lane aligned.

    Returns: wx_rel [dim, S], wx_feat [in_features, S], b_all [1, S]
    (S = sum of padded widths), wh1..wh4, w5 [nf_pad, out], b5 [1, out].
    """
    widths = [nf * m for m in _MULTS]
    pwidths = _padded_widths(nf, pad_to)
    ks = [params[f"fc{i}"]["kernel"] for i in range(6)]
    bs = [params[f"fc{i}"]["bias"] for i in range(6)]

    def pad_cols(a, w, pw):
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pw - w)])

    wx_parts = [pad_cols(ks[0], widths[0], pwidths[0])]
    b_parts = [pad_cols(bs[0][None], widths[0], pwidths[0])]
    wh = []
    prev, pprev = widths[0], pwidths[0]
    din = dim + in_features
    for i in range(1, 5):
        k = ks[i]
        assert k.shape[0] == prev + din, (k.shape, prev, din)
        wh_i = jnp.pad(k[:prev], ((0, pprev - prev), (0, 0)))
        wh.append(pad_cols(wh_i, widths[i], pwidths[i]).astype(dtype))
        wx_parts.append(pad_cols(k[prev:], widths[i], pwidths[i]))
        b_parts.append(pad_cols(bs[i][None], widths[i], pwidths[i]))
        prev, pprev = widths[i], pwidths[i]
    wx_all = jnp.concatenate(wx_parts, axis=1)
    w5 = jnp.pad(ks[5], ((0, pwidths[-1] - widths[-1]), (0, 0)))
    wx_rel = wx_all[:dim]
    b_all = jnp.concatenate(b_parts, axis=1)
    # rel_k = frac - offset_k, so the per-corner rel projection factors
    # into frac @ Wx_rel (NB rows, done once per POINT in the kernel)
    # plus a per-corner constant folded into the bias:
    #   corner_bias[k] = b_all - offset_k @ Wx_rel.
    offs = jnp.asarray(corner_offsets(dim), jnp.float32)     # [K, dim]
    corner_bias = b_all - offs @ wx_rel.astype(jnp.float32)  # [K, S]
    packed = {
        "wx_rel": wx_rel.astype(dtype),
        "wx_feat": wx_all[dim:].astype(dtype),
        "corner_bias": corner_bias.astype(jnp.float32),
        "w5": w5.astype(dtype),
        "b5": bs[5][None, :].astype(jnp.float32),
    }
    for i, w in enumerate(wh):
        packed[f"wh{i + 1}"] = w
    return packed


def cell_major_features(grid: jnp.ndarray) -> jnp.ndarray:
    """[*spatial, C] node grid -> [n_cells, 2^D * C] cell-corner rows.

    Built from 2^D structured shifted slices (sequential HBM copies, no
    random access); corner order matches ops.grid_interp.corner_offsets.
    """
    spatial = grid.shape[:-1]
    dim = len(spatial)
    offs = corner_offsets(dim)
    slices = []
    for o in offs:
        idx = tuple(slice(int(o[d]), spatial[d] - 1 + int(o[d]))
                    for d in range(dim))
        slices.append(grid[idx])
    cells = jnp.stack(slices, axis=-2)          # [*cells, 2^D, C]
    n_cells = int(np.prod([s - 1 for s in spatial]))
    return cells.reshape(n_cells, offs.shape[0] * grid.shape[-1])


def corner_tables(grid: jnp.ndarray, tile: int,
                  n_windows: int = 1) -> Tuple[jnp.ndarray, int]:
    """[*spatial, C] node grid -> ([n_tiles*tile + (W-1)*tile, 2^D * C],
    n_tiles) corner-interleaved cell table for the in-kernel gather.

    Row c holds the latents of ALL 2^D corner nodes of cell c,
    corner-major in lanes (same corner order as ``corner_offsets``) —
    so ONE window DMA per block brings every corner's tile (measured:
    8 separate per-corner [tile, C] window copies per block were
    DMA-issue-bound). Rows are padded with zeros to a whole number of
    ``tile``-row tiles plus ``n_windows - 1`` extra tiles so a window
    anchored at the last tile never reads out of bounds. Built from
    2^D structured shifted slices — no random access, exactly like
    ``cell_major_features``.
    """
    spatial = grid.shape[:-1]
    dim = len(spatial)
    offs = corner_offsets(dim)
    n_cells = int(np.prod([s - 1 for s in spatial]))
    n_tiles = -(-n_cells // tile)
    rows = n_tiles * tile + (n_windows - 1) * tile
    cells = cell_major_features(grid)           # [n_cells, 2^D * C]
    return jnp.pad(cells, ((0, rows - n_cells), (0, 0))), n_tiles


def _corner_weight_cols(frac32, dim: int, n_corners: int):
    """Per-corner multilinear weight columns [NB, 1] from fracs."""
    offs_np = corner_offsets(dim)
    cols = []
    for kidx in range(n_corners):
        col = None
        for d in range(dim):
            fd = frac32[:, d:d + 1]
            term = fd if offs_np[kidx, d] else (1.0 - fd)
            col = term if col is None else col * term
        cols.append(col)
    return cols


def _augmented_xs(feats_cm, frac, wxa_ref, n_corners, nb, compute_dtype):
    """Complete [R, S] pre-activation skip buffer in ONE MXU matmul.

    The factored form xs = feats @ Wx_feat + frac @ Wx_rel + cb[corner]
    is three ops plus two full [R, S] VPU passes (broadcast-add of the
    per-corner bias, add of the two matmul outputs). Augmenting the
    operand with the frac columns and a one-hot corner-indicator block
    folds ALL of it into a single contraction

        [feats | frac | e_corner] @ [Wx_feat; Wx_rel; corner_bias]

    whose K grows C -> C+dim+2^D (32 -> 48 at nf=32) — free on the MXU
    (any K <= 128 is one systolic pass) while the VPU passes disappear.
    The indicator entries are exact in bf16; corner_bias rows round to
    the compute dtype, the same rounding every other operand gets.

    ``frac`` must arrive lane-padded to ``_FRAC_LANES`` columns (mosaic
    cannot lane-concat a 3-wide vector — "unsupported shape cast"); the
    matching ``Wx_rel`` rows are zero-padded in ``_augment_params``.
    """
    r = feats_cm.shape[0]
    # Rows are CORNER-major ([k*NB + p]): the frac block tiles as a
    # plain sublane concat and the indicator derives from row // NB.
    frac_t = jnp.concatenate([frac] * n_corners, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, n_corners), 0) // nb
    ind = (rows == jax.lax.broadcasted_iota(
        jnp.int32, (r, n_corners), 1)).astype(compute_dtype)
    aug = jnp.concatenate([feats_cm, frac_t, ind], axis=1)
    return jnp.dot(aug, wxa_ref[:],
                   preferred_element_type=jnp.float32)      # [R, S] f32


_FRAC_LANES = 8     # frac lane-padded width (mosaic needs 8-lane concat)


def _augment_params(packed, compute_dtype):
    """[Wx_feat; Wx_rel (zero-padded rows); corner_bias] stacked for
    ``_augmented_xs``."""
    wxr = packed["wx_rel"].astype(jnp.float32)
    wxr = jnp.pad(wxr, ((0, _FRAC_LANES - wxr.shape[0]), (0, 0)))
    return jnp.concatenate(
        [packed["wx_feat"].astype(jnp.float32), wxr,
         packed["corner_bias"]], axis=0).astype(compute_dtype)


def _kernel_gather(bt_ref, cell_ref, frac_ref, *refs, widths, dim: int,
                   n_corners: int, n_windows: int, tile: int,
                   negative_slope: float, compute_dtype,
                   activation: str = "leaky_relu"):
    """Corner-major decode+blend with the corner gather IN-kernel.

    The corner gather runs as an MXU matmul: one one-hot matrix
    [NB, W*tile] built from the block's local cell ids (shared by all
    corners — the corner offset is baked into the per-corner tables)
    multiplies each corner's VMEM-resident window [W*tile, C]. Exact
    in bf16 (rows select single table entries), and mosaic-friendly:
    ``tpu.dynamic_gather`` is a single-vreg shuffle (measured, round 3)
    so a real row gather is inexpressible — the MXU route costs a few
    % of the MLP's FLOPs instead.

    Chain rows are CORNER-major ([k*NB + p]) so the gathered per-corner
    blocks concatenate along sublanes with no interleaving relayout;
    the blend slices them back per corner (static sublane slices).
    """
    wins = refs[:n_windows]
    (wxa_ref, wh1_ref, wh2_ref, wh3_ref, wh4_ref,
     w5_ref, b5_ref, out_ref) = refs[n_windows:]
    offs = np.cumsum([0] + list(widths))
    wt = n_windows * tile

    from space_time_pde_tpu.models.nonlinearities import get_activation
    act = get_activation(activation, negative_slope)

    i = pl.program_id(0)
    base = bt_ref[i]
    nb = frac_ref.shape[0]
    local = cell_ref[:] - base * tile                       # [NB, 1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (nb, wt), 1)
    onehot = (lanes == local).astype(compute_dtype)         # [NB, WT]

    # One corner-interleaved window per block: [WT, 2^D * C]; each
    # corner's gather is the same one-hot against a static lane slice
    # of the window. (A single [NB, WT] @ [WT, K*C] matmul would fill
    # all output lanes, but its corner-major re-stacking needs a
    # sublane concat of lane-offset slices, which mosaic cannot lower
    # — "tpu.concatenate" with heterogeneous vpad in_layouts.)
    win = jnp.concatenate([wins[j][:] for j in range(n_windows)],
                          axis=0).astype(compute_dtype)     # [WT, K*C]
    c = win.shape[-1] // n_corners
    fks = [jnp.dot(onehot, win[:, k * c:(k + 1) * c],
                   preferred_element_type=jnp.float32)
           for k in range(n_corners)]
    feats_cm = jnp.concatenate(fks, axis=0).astype(compute_dtype)

    frac = frac_ref[:].astype(compute_dtype)        # [NB, _FRAC_LANES]
    xs = _augmented_xs(feats_cm, frac, wxa_ref, n_corners, nb,
                       compute_dtype)                       # [R, S] f32

    h = act(xs[:, offs[0]:offs[1]])
    for li, wh_ref in enumerate((wh1_ref, wh2_ref, wh3_ref, wh4_ref)):
        pre = jnp.dot(h.astype(compute_dtype), wh_ref[:],
                      preferred_element_type=jnp.float32)
        h = act(pre + xs[:, offs[li + 1]:offs[li + 2]])

    frac32 = frac_ref[:].astype(jnp.float32)
    cols = _corner_weight_cols(frac32, dim, n_corners)
    nf = widths[-1]
    hblend = None
    for k in range(n_corners):
        term = h[k * nb:(k + 1) * nb] * cols[k]             # [NB, nf]
        hblend = term if hblend is None else hblend + term
    out = jnp.dot(hblend.astype(compute_dtype), w5_ref[:],
                  preferred_element_type=jnp.float32) + b5_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def fused_decode_blend_gather(tables, cell_flat, frac,
                              base_tile, packed, *, nf: int,
                              n_corners: int, tile: int,
                              n_windows: int = 1,
                              negative_slope: float = 0.01,
                              block_pts: int = 256,
                              compute_dtype=jnp.bfloat16,
                              pad_to: int = 0,
                              interpret: bool = False,
                              activation: str = "leaky_relu"
                              ) -> jnp.ndarray:
    """In-kernel-gather decode: tables [rows, 2^D * C]
    (``corner_tables``), cell_flat [N] int32 flat cell ids,
    frac [N, dim], base_tile [G] int32 window anchors
    (G = ceil(N/block_pts); all zeros in whole-table mode) -> [N, out].

    Caller contract: every point in block g must satisfy
    ``base_tile[g]*tile <= cell < (base_tile[g]+n_windows)*tile`` —
    out-of-window points silently decode ZERO corner latents (the
    one-hot has no matching lane). ``fused_query_local_implicit_grid``
    enforces this with a sort + fits-check + fallback.
    """
    n = cell_flat.shape[0]
    dim = frac.shape[-1]
    # Lane-pad frac so every in-kernel concat piece is >= 8 lanes wide
    # (see _augmented_xs); the pad lanes multiply into zero Wx_rel rows.
    frac = jnp.pad(frac, ((0, 0), (0, _FRAC_LANES - dim)))
    nb = block_pts
    n_pad = (-n) % nb
    if n_pad:
        cell_flat = jnp.pad(cell_flat, (0, n_pad))
        frac = jnp.pad(frac, ((0, n_pad), (0, 0)))
        base_tile = jnp.pad(base_tile, (0, (n + n_pad) // nb
                                        - base_tile.shape[0]))
    n_tot = n + n_pad
    g = n_tot // nb
    out_dim = packed["w5"].shape[1]
    kc = tables.shape[-1]

    param_names = ["wh1", "wh2", "wh3", "wh4", "w5", "b5"]
    param_vals = ([_augment_params(packed, compute_dtype)]
                  + [packed[p] for p in param_names])
    param_specs = [
        pl.BlockSpec(p.shape, lambda i, bt, nd=p.ndim: (0,) * nd)
        for p in param_vals
    ]
    win_specs = [
        pl.BlockSpec((tile, kc),
                     functools.partial(lambda i, bt, j=j: (bt[i] + j, 0)))
        for j in range(n_windows)
    ]

    kernel = functools.partial(
        _kernel_gather, widths=tuple(_padded_widths(nf, pad_to)),
        dim=dim, n_corners=n_corners, n_windows=n_windows, tile=tile,
        negative_slope=negative_slope, compute_dtype=compute_dtype,
        activation=activation)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((nb, 1), lambda i, bt: (i, 0)),
            pl.BlockSpec((nb, _FRAC_LANES), lambda i, bt: (i, 0)),
            *win_specs,
            *param_specs,
        ],
        out_specs=pl.BlockSpec((nb, out_dim), lambda i, bt: (i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, out_dim), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(base_tile, cell_flat[:, None], frac,
      *([tables] * n_windows), *param_vals)
    return out[:n]


def _kernel(feats_ref, frac_ref, wxf_ref, wxr_ref, cb_ref, wh1_ref,
            wh2_ref, wh3_ref, wh4_ref, w5_ref, b5_ref, out_ref, *,
            widths, n_corners: int, negative_slope: float, compute_dtype,
            activation: str = "leaky_relu"):
    offs = np.cumsum([0] + list(widths))
    s_tot = int(offs[-1])

    from space_time_pde_tpu.models.nonlinearities import get_activation
    act = get_activation(activation, negative_slope)

    feats = feats_ref[:].astype(compute_dtype)              # [R, C]
    nb = feats.shape[0] // n_corners
    # Per-corner input projection, factored: rel_k = frac - offset_k, so
    # xs_rel_k = frac @ Wx_rel - offset_k @ Wx_rel; the second term is a
    # per-corner constant pre-folded (with the layer biases) into
    # cb_ref. The frac matmul runs on NB rows instead of NB*2^D — 8x
    # fewer rows on a K-padded (K=dim) matmul. Measured 26% faster.
    # (The gather kernel's augmented-matmul trick does not port here:
    # rows are POINT-major ([p*K + k]) and mosaic cannot express the
    # interleaved frac tiling without an unsupported shape cast.)
    frac = frac_ref[:].astype(compute_dtype)                # [NB, dim]
    xs_f = jnp.dot(feats, wxf_ref[:],
                   preferred_element_type=jnp.float32)      # [R, S]
    xs_r = jnp.dot(frac, wxr_ref[:],
                   preferred_element_type=jnp.float32)      # [NB, S]
    xs_rc = (jnp.broadcast_to(xs_r[:, None, :], (nb, n_corners, s_tot))
             + cb_ref[:][None])                             # [NB, K, S]
    # The wide skip buffer is stored in compute dtype — a [R, 31*nf]
    # f32 buffer plus slice temporaries would blow the VMEM budget.
    xs = (xs_f + xs_rc.reshape(feats.shape[0], s_tot)).astype(
        compute_dtype)

    h = act(xs[:, offs[0]:offs[1]].astype(jnp.float32))
    for i, wh_ref in enumerate((wh1_ref, wh2_ref, wh3_ref, wh4_ref)):
        pre = jnp.dot(h.astype(compute_dtype), wh_ref[:],
                      preferred_element_type=jnp.float32)
        h = act(pre + xs[:, offs[i + 1]:offs[i + 2]].astype(jnp.float32))

    # Multilinear blend on the narrow feature (final layer is linear).
    # Weights computed in-kernel from frac (tiny VPU op; saves an
    # [N, K] HBM round-trip and its producing XLA fusion).
    dim = frac_ref.shape[-1]
    offs_np = corner_offsets(dim)                           # [K, dim] static
    frac32 = frac_ref[:].astype(jnp.float32)                # [NB, dim]
    cols = []
    for kidx in range(n_corners):
        col = None
        for d in range(dim):
            fd = frac32[:, d:d + 1]                         # [NB, 1]
            term = fd if offs_np[kidx, d] else (1.0 - fd)
            col = term if col is None else col * term
        cols.append(col)
    w = jnp.concatenate(cols, axis=1)                       # [NB, K]
    hb = h.reshape(nb, n_corners, widths[-1])               # [NB, K, nf]
    hblend = jnp.sum(hb * w[:, :, None], axis=1)            # [NB, nf]
    out = jnp.dot(hblend.astype(compute_dtype), w5_ref[:],
                  preferred_element_type=jnp.float32) + b5_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def fused_decode_blend(feats2, frac, packed, *, nf: int, n_corners: int,
                       negative_slope: float = 0.01,
                       block_pts: int = 256,
                       compute_dtype=jnp.bfloat16,
                       pad_to: int = 0,
                       interpret: bool = False,
                       activation: str = "leaky_relu") -> jnp.ndarray:
    """feats2: [N*K, C]; frac: [N, dim] in-cell fractions -> [N, out].

    Multilinear blend weights are derived from ``frac`` in-kernel.
    ``pad_to`` must match the value used in ``pack_imnet_params``; with
    ``pad_to > 0`` the activation must map 0 -> 0 (relu/leaky_relu/tanh/
    sin/...) so the padded lanes stay exactly zero.
    """
    nk, c = feats2.shape
    k = n_corners
    n = nk // k
    assert nk == n * k and frac.shape[0] == n, (feats2.shape, frac.shape)
    out_dim = packed["w5"].shape[1]
    nb = block_pts
    n_pad = (-n) % nb
    if n_pad:
        feats2 = jnp.pad(feats2, ((0, n_pad * k), (0, 0)))
        frac = jnp.pad(frac, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad
    grid = (n_tot // nb,)
    r = nb * k
    dim = frac.shape[-1]

    param_names = ["wx_feat", "wx_rel", "corner_bias", "wh1", "wh2",
                   "wh3", "wh4", "w5", "b5"]
    param_vals = [packed[p] for p in param_names]
    mspace = pl.ANY if interpret else pltpu.VMEM
    param_specs = [
        pl.BlockSpec(p.shape, lambda i: (0,) * p.ndim, memory_space=mspace)
        for p in param_vals
    ]

    kernel = functools.partial(
        _kernel, widths=tuple(_padded_widths(nf, pad_to)), n_corners=k,
        negative_slope=negative_slope, compute_dtype=compute_dtype,
        activation=activation)

    compiler_params = None
    if not interpret:
        # The default scoped-vmem cap (16MB) is well below v5e's
        # physical VMEM; the [NB, K, S] skip expansion needs headroom.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, c), lambda i: (i, 0), memory_space=mspace),
            pl.BlockSpec((nb, dim), lambda i: (i, 0), memory_space=mspace),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((nb, out_dim), lambda i: (i, 0),
                               memory_space=mspace),
        out_shape=jax.ShapeDtypeStruct((n_tot, out_dim), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(feats2, frac, *param_vals)
    return out[:n]


def _flat_cells(cell, spatial):
    dim = len(spatial)
    cells_shape = [s - 1 for s in spatial]
    strides = np.ones(dim, dtype=np.int32)
    for a in range(dim - 2, -1, -1):
        strides[a] = strides[a + 1] * cells_shape[a + 1]
    return jnp.sum(cell * jnp.asarray(strides), axis=-1)


# In-kernel gather dispatch thresholds (measured on 1x v5e, round 3):
# a whole-table one-hot matmul costs n_cells*2^D*C MACs/point — equal
# to the nf=32 MLP itself at ~6.4k cells — so small grids gather
# against the resident table with no sort, large grids sort + window.
_WHOLE_TABLE_CELLS = 2048
_WINDOW_TILE = 128
_N_WINDOWS = 2


def fused_query_local_implicit_grid(imnet, params, latent_grid, pts,
                                    xmin=0.0, xmax=1.0,
                                    block_pts: int = 256,
                                    compute_dtype=jnp.bfloat16,
                                    pad_to: int = 128,
                                    interpret: bool = False,
                                    gather: str = "auto",
                                    points_sorted: bool = False):
    """Drop-in fused version of models.query_local_implicit_grid.

    imnet: the ImNet module (for static dims); params: its flax params.
    latent_grid: [B, *spatial, C]; pts: [B, N, D] -> [B, N, out].

    ``gather`` selects the corner-latent path:
      - "pregather": XLA materializes [N, 2^D*C] corner rows in HBM
        (the round-1/2 path; always correct, any point distribution);
      - "kernel": the gather runs inside the Pallas kernel as a one-hot
        MXU matmul against VMEM-resident cell tables — whole-table for
        small grids, sorted 2x128-cell windows for large ones (with a
        runtime fits-check falling back to "pregather" via lax.cond);
      - "auto": "kernel" (its fallback keeps it always-correct).
    ``points_sorted``: promise that each consecutive ``block_pts`` run
    of points spans < 256 cells in flat cell order (dense-lattice
    chunks do) — skips the sort, keeps the fits-guard.
    """
    packed = pack_imnet_params(
        params, imnet.dim, imnet.in_features, imnet.nf,
        dtype=compute_dtype, pad_to=pad_to)
    activation = getattr(imnet, "activation", "leaky_relu")

    def pregather(grid, cell_flat, frac):
        c = grid.shape[-1]
        n = cell_flat.shape[0]
        k = 2 ** (grid.ndim - 1)
        cell_feats = cell_major_features(grid.astype(compute_dtype))
        rows = jnp.take(cell_feats, cell_flat, axis=0)      # [N, K*C]
        feats2 = rows.reshape(n * k, c)                     # free view
        return fused_decode_blend(
            feats2, frac, packed, nf=imnet.nf, n_corners=k,
            negative_slope=imnet.negative_slope,
            block_pts=block_pts, compute_dtype=compute_dtype,
            pad_to=pad_to, interpret=interpret, activation=activation)

    def kernel_gather(grid, cell_flat, frac):
        dim = grid.ndim - 1
        k = 2 ** dim
        n = cell_flat.shape[0]
        n_cells = int(np.prod([s - 1 for s in grid.shape[:-1]]))
        common = dict(nf=imnet.nf, n_corners=k,
                      negative_slope=imnet.negative_slope,
                      block_pts=block_pts, compute_dtype=compute_dtype,
                      pad_to=pad_to, interpret=interpret,
                      activation=activation)
        gcast = grid.astype(compute_dtype)
        n_pad = (-n) % block_pts
        g = (n + n_pad) // block_pts
        if n_cells <= _WHOLE_TABLE_CELLS:
            rows = -(-n_cells // 8) * 8      # sublane-align the table
            tables, _ = corner_tables(gcast, rows, 1)
            base = jnp.zeros((g,), jnp.int32)
            return fused_decode_blend_gather(
                tables, cell_flat, frac, base, packed,
                tile=rows, n_windows=1, **common)
        tile, w = _WINDOW_TILE, _N_WINDOWS
        tables, _ = corner_tables(gcast, tile, w)
        dim = frac.shape[-1]
        if points_sorted:
            sc, frac_s, order = cell_flat, frac, None
        else:
            # Multi-operand bitonic sort carries frac columns through
            # the sort network — measured ~2x cheaper than random-index
            # jnp.take of the [N, dim] rows afterwards (structured
            # compare-swaps vs 12-byte random gathers). Cell id and
            # original position pack into ONE int32 key when they fit
            # (ties broken by position = a stable sort), dropping an
            # operand from the network.
            shift = max(n - 1, 1).bit_length()
            if n_cells << shift < 2 ** 31:
                key = ((cell_flat << shift)
                       | jnp.arange(n, dtype=jnp.int32))
                skey, *fcols = jax.lax.sort(
                    (key, *[frac[:, d] for d in range(dim)]),
                    num_keys=1)
                sc = skey >> shift
                order = skey & ((1 << shift) - 1)
            else:
                sc, order, *fcols = jax.lax.sort(
                    (cell_flat, jnp.arange(n, dtype=jnp.int32),
                     *[frac[:, d] for d in range(dim)]), num_keys=1)
            frac_s = jnp.stack(fcols, axis=-1)
        # Edge-pad so the final partial block's fits-check sees its
        # true max cell (zero-padding would understate the span).
        scp = jnp.pad(sc, (0, n_pad), mode="edge") if n_pad else sc
        base = scp[::block_pts] // tile                     # [G]
        last = scp[block_pts - 1::block_pts]
        fits = jnp.max(last - base * tile) < w * tile

        # The cond wraps ONLY the decode; both branches consume the
        # SORTED inputs and emit sorted outputs, so the (shared) unsort
        # sits outside and the cond's fusion barrier stays narrow.
        out_s = jax.lax.cond(
            fits,
            lambda _: fused_decode_blend_gather(
                tables, sc, frac_s, base, packed,
                tile=tile, n_windows=w, **common),
            lambda _: pregather(grid, sc, frac_s),
            operand=None)
        if order is None:
            return out_s
        # Unsort by sorting on the original positions (a second
        # multi-operand sort — cheaper than inv-argsort + take).
        out_dim = out_s.shape[-1]
        _, *ocols = jax.lax.sort(
            (order, *[out_s[:, d] for d in range(out_dim)]),
            num_keys=1)
        return jnp.stack(ocols, axis=-1)

    def single(grid, p):
        spatial = grid.shape[:-1]
        cell, frac = _locate(p, spatial, xmin, xmax)
        cell_flat = _flat_cells(cell, spatial)
        if gather == "pregather":
            return pregather(grid, cell_flat, frac)
        return kernel_gather(grid, cell_flat, frac)

    if gather == "pregather":
        return jax.vmap(single)(latent_grid, pts)
    # Static python loop over batch: the large-grid path branches on a
    # runtime fits-check with lax.cond, and vmap-of-cond would execute
    # BOTH branches per element; callers here (bench, evaluation,
    # tests) run B=1..8, so an unrolled loop costs nothing.
    outs = [single(latent_grid[b], pts[b])
            for b in range(latent_grid.shape[0])]
    return jnp.stack(outs, axis=0)
