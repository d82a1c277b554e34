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
