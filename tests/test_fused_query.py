"""M7 Pallas kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.ops.fused_query import (
    cell_major_features,
    fused_decode_blend,
    fused_query_local_implicit_grid,
    pack_imnet_params,
)
from space_time_pde_tpu.ops.grid_interp import corner_offsets


def _setup(nf=4, C=8, seed=0):
    model = ImNet(dim=3, in_features=C, out_features=4, nf=nf)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.ones((1, 3 + C)))["params"]
    return model, params


@pytest.mark.parametrize("n,block", [(64, 16), (50, 16), (16, 16), (7, 8)])
def test_fused_decode_blend_matches_imnet(n, block):
    model, params = _setup()
    rng = np.random.RandomState(1)
    feats = rng.randn(n, 8, 8).astype(np.float32)
    frac = rng.rand(n, 3).astype(np.float32)

    packed = pack_imnet_params(params, 3, 8, model.nf, dtype=jnp.float32)
    got = fused_decode_blend(
        jnp.asarray(feats.reshape(n * 8, 8)),
        jnp.asarray(frac), packed, nf=model.nf, n_corners=8,
        compute_dtype=jnp.float32, block_pts=block, interpret=True)

    # Reference path: rel_k = frac - offset_k, multilinear weights from
    # frac, ImNet per corner, blend.
    offs = corner_offsets(3).astype(np.float32)             # [8, 3]
    rel = frac[:, None, :] - offs[None]                     # [n, 8, 3]
    per_axis = np.where(offs[None].astype(bool), frac[:, None, :],
                        1.0 - frac[:, None, :])
    w = per_axis.prod(-1)                                   # [n, 8]
    x = jnp.concatenate([jnp.asarray(rel), jnp.asarray(feats)], axis=-1)
    ref = model.apply({"params": params}, x)                # [n, 8, 4]
    want = jnp.einsum("nko,nk->no", ref, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cell_major_features_layout():
    rng = np.random.RandomState(7)
    grid = rng.randn(3, 4, 5, 2).astype(np.float32)
    cells = np.asarray(cell_major_features(jnp.asarray(grid)))
    assert cells.shape == (2 * 3 * 4, 8 * 2)
    offs = corner_offsets(3)
    # Spot-check cell (1, 2, 3): row index 1*(3*4) + 2*4 + 3.
    row = cells[1 * 12 + 2 * 4 + 3].reshape(8, 2)
    for ki, o in enumerate(offs):
        np.testing.assert_array_equal(
            row[ki], grid[1 + o[0], 2 + o[1], 3 + o[2]])


def test_fused_query_matches_jnp_path():
    model, params = _setup(nf=2, C=4, seed=2)
    rng = np.random.RandomState(3)
    grid = jnp.asarray(rng.randn(2, 4, 5, 6, 4).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 40, 3).astype(np.float32))

    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=16, interpret=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_query_nonunit_domain_and_edge_cells():
    model, params = _setup(nf=2, C=4, seed=4)
    rng = np.random.RandomState(5)
    grid = jnp.asarray(rng.randn(1, 3, 3, 3, 4).astype(np.float32))
    # Points exactly on nodes, faces, and out of domain (clamping).
    pts = jnp.asarray(np.array([[
        [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.5, 0.5],
        [0.0, 1.0, 0.5], [1.2, -0.1, 0.5], [0.25, 0.75, 0.999],
    ]], np.float32))
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=8, interpret=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Windowed in-kernel gather path (grid > _WHOLE_TABLE_CELLS): the round-3
# headline path — sort + scalar-prefetch window anchors + fits-check +
# lax.cond pregather fallback + unsort (ops/fused_query.py::kernel_gather).
# Each test asserts against the jnp oracle AND independently recomputes the
# fits predicate to prove it targets the intended branch.
# ---------------------------------------------------------------------------

from space_time_pde_tpu.ops.fused_query import (  # noqa: E402
    _N_WINDOWS,
    _WHOLE_TABLE_CELLS,
    _WINDOW_TILE,
)


def _flat_cells_np(pts, spatial):
    """Flat cell ids of [N, D] points in [0,1]^D (replicates _locate +
    _flat_cells for the test-side fits predicate)."""
    spatial = np.asarray(spatial)
    s = np.clip(pts * (spatial - 1.0), 0.0, spatial - 1.0)
    cell = np.clip(np.floor(s).astype(np.int64), 0, spatial - 2)
    cells_shape = spatial - 1
    strides = np.ones(len(spatial), np.int64)
    for a in range(len(spatial) - 2, -1, -1):
        strides[a] = strides[a + 1] * cells_shape[a + 1]
    return (cell * strides).sum(-1)


def _fits(pts, spatial, block):
    """The kernel dispatch's fits predicate, recomputed independently."""
    sc = np.sort(_flat_cells_np(pts, spatial))
    n_pad = (-len(sc)) % block
    if n_pad:
        sc = np.pad(sc, (0, n_pad), mode="edge")
    base = sc[::block] // _WINDOW_TILE
    last = sc[block - 1::block]
    return (last - base * _WINDOW_TILE).max() < _N_WINDOWS * _WINDOW_TILE


def _cluster_pts(rng, n, spatial, c0, c1_lo, c1_n):
    """n points confined to cells c0 x [c1_lo, c1_lo+c1_n) x free — a
    flat-cell span <= c1_n*(s2-1) that fits one 2x128 window."""
    s0, s1, s2 = spatial
    p = rng.rand(n, 3).astype(np.float32)
    p[:, 0] = (c0 + p[:, 0] * 0.98 + 0.01) / (s0 - 1)
    p[:, 1] = (c1_lo + p[:, 1] * (c1_n * 0.98) + 0.01) / (s1 - 1)
    return p


def test_windowed_gather_sorted_windows_match_oracle():
    """Random clustered points: sort + window anchors + fits PASS."""
    model, params = _setup(nf=2, C=4, seed=6)
    spatial = (8, 20, 32)                    # 7*19*31 = 4123 cells
    assert np.prod([s - 1 for s in spatial]) > _WHOLE_TABLE_CELLS
    rng = np.random.RandomState(11)
    grid = jnp.asarray(rng.randn(1, *spatial, 4).astype(np.float32))
    # Two far-apart clusters, each a whole block, each spanning <= 123
    # cells (4 c1-slabs x stride 31) so every sorted block fits its
    # window even with the anchor up to 127 cells below the first cell.
    block = 256
    pts_np = np.concatenate([
        _cluster_pts(rng, block, spatial, c0=1, c1_lo=2, c1_n=4),
        _cluster_pts(rng, block, spatial, c0=5, c1_lo=10, c1_n=4),
    ])[None]
    assert _fits(pts_np[0], spatial, block)
    pts = jnp.asarray(pts_np)
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=block, interpret=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_windowed_gather_adversarial_fallback_matches_oracle():
    """Uniform points over 4123 cells: per-block span >> the 2x128
    window -> the runtime fits-check must take the lax.cond pregather
    fallback (and the odd N exercises the edge-pad of the fits check)."""
    model, params = _setup(nf=2, C=4, seed=7)
    spatial = (8, 20, 32)
    rng = np.random.RandomState(13)
    grid = jnp.asarray(rng.randn(1, *spatial, 4).astype(np.float32))
    block = 256
    pts_np = rng.rand(1, 300, 3).astype(np.float32)   # 300 % 256 != 0
    assert not _fits(pts_np[0], spatial, block)
    pts = jnp.asarray(pts_np)
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=block, interpret=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_windowed_gather_points_sorted_lattice():
    """points_sorted=True on a dense-lattice chunk (the eval-CLI
    contract: one lattice row per block -> span <= 31 cells, no sort,
    no unsort) matches both the oracle and the sorting path."""
    model, params = _setup(nf=2, C=4, seed=8)
    spatial = (8, 20, 32)
    rng = np.random.RandomState(17)
    grid = jnp.asarray(rng.randn(1, *spatial, 4).astype(np.float32))
    block = 256
    # Row-major lattice (t, z, x) with x-size == block: flat cell ids
    # are non-decreasing within every block.
    t = np.linspace(0, 1, 4, dtype=np.float32)
    z = np.linspace(0, 1, 10, dtype=np.float32)
    x = np.linspace(0, 1, block, dtype=np.float32)
    pts_np = np.stack(np.meshgrid(t, z, x, indexing="ij"),
                      axis=-1).reshape(1, -1, 3)
    assert _fits(pts_np[0], spatial, block)
    pts = jnp.asarray(pts_np)
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=block, interpret=True, points_sorted=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # And the unsorted entry (sort + unsort) agrees bit-for-bit-ish.
    got2 = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=block, interpret=True, points_sorted=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-6, atol=1e-6)


def test_windowed_gather_wide_sort_key_branch():
    """65536-cell grid with 32k points: n_cells << ceil(log2 N) >= 2**31,
    so the packed-int32 sort key cannot hold (cell, position) and the
    sort must take the wide multi-operand branch; clustered points keep
    the fits-check passing so the windowed kernel still runs."""
    model, params = _setup(nf=2, C=4, seed=9)
    spatial = (17, 65, 65)                   # 16*64*64 = 65536 cells
    n_cells = int(np.prod([s - 1 for s in spatial]))
    rng = np.random.RandomState(19)
    grid = jnp.asarray(rng.randn(1, *spatial, 4).astype(np.float32))
    n, block = 32768, 512
    shift = max(n - 1, 1).bit_length()
    assert n_cells << shift >= 2 ** 31    # targets the wide-key branch
    # One cluster spanning <= 127 cells (2 c1-slabs x stride 64).
    pts_np = _cluster_pts(rng, n, spatial, c0=7, c1_lo=20, c1_n=2)[None]
    assert _fits(pts_np[0], spatial, block)
    pts = jnp.asarray(pts_np)
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=block, interpret=True)
    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pack_imnet_params_shapes():
    model, params = _setup(nf=4, C=8)
    packed = pack_imnet_params(params, 3, 8, 4, dtype=jnp.float32)
    tot = 4 * (16 + 8 + 4 + 2 + 1)
    assert packed["wx_rel"].shape == (3, tot)
    assert packed["wx_feat"].shape == (8, tot)
    assert packed["corner_bias"].shape == (8, tot)
    assert packed["wh1"].shape == (64, 32)
    assert packed["wh4"].shape == (8, 4)
    assert packed["w5"].shape == (4, 4)
