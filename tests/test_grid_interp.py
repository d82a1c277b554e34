"""L0 oracle tests: grid interpolation vs scipy and vs analytic cases.

Mirrors the reference's module-level sanity checks (its
``src/regular_nd_grid_interpolation.py`` was validated against
``scipy.interpolate.RegularGridInterpolator``), upgraded to pytest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import RegularGridInterpolator

from space_time_pde_tpu.ops import (
    corner_offsets,
    grid_interp_coefficients,
    multilinear_interp,
)


@pytest.mark.parametrize("dim,spatial", [
    (1, (7,)),
    (2, (5, 9)),
    (3, (4, 6, 5)),
    (4, (3, 4, 5, 3)),
])
def test_multilinear_matches_scipy(dim, spatial):
    rng = np.random.RandomState(0)
    C = 3
    grid = rng.randn(*spatial, C).astype(np.float32)
    pts = rng.rand(257, dim).astype(np.float32)

    got = np.asarray(multilinear_interp(jnp.asarray(grid), jnp.asarray(pts)))

    axes = [np.linspace(0.0, 1.0, n) for n in spatial]
    want = np.stack(
        [RegularGridInterpolator(axes, grid[..., c])(pts) for c in range(C)],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_nonunit_domain_and_per_axis_bounds():
    rng = np.random.RandomState(1)
    spatial = (6, 8, 5)
    grid = rng.randn(*spatial, 2).astype(np.float32)
    xmin = np.array([0.0, -1.0, 2.0], np.float32)
    xmax = np.array([3.0, 1.0, 2.5], np.float32)
    pts = (rng.rand(100, 3) * (xmax - xmin) + xmin).astype(np.float32)

    got = np.asarray(
        multilinear_interp(jnp.asarray(grid), jnp.asarray(pts), xmin, xmax))
    axes = [np.linspace(xmin[d], xmax[d], spatial[d]) for d in range(3)]
    want = np.stack(
        [RegularGridInterpolator(axes, grid[..., c])(pts) for c in range(2)],
        axis=-1,
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_out_of_domain_clamps_to_boundary():
    grid = jnp.arange(5.0)[:, None]  # identity ramp, [5, 1]
    pts = jnp.array([[-0.5], [1.5]])
    out = multilinear_interp(grid, pts)
    np.testing.assert_allclose(np.asarray(out), [[0.0], [4.0]], atol=1e-6)


def test_weights_sum_to_one_and_rel_coords_range():
    rng = np.random.RandomState(2)
    grid = jnp.asarray(rng.randn(4, 5, 6, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(64, 3).astype(np.float32))
    feats, w, rel = grid_interp_coefficients(grid, pts)
    assert feats.shape == (64, 8, 8)
    assert w.shape == (64, 8)
    assert rel.shape == (64, 8, 3)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.asarray(w) >= -1e-6)
    r = np.asarray(rel)
    assert r.min() >= -1.0 - 1e-6 and r.max() <= 1.0 + 1e-6


def test_exact_at_grid_nodes():
    rng = np.random.RandomState(3)
    spatial = (4, 5, 3)
    grid = rng.randn(*spatial, 2).astype(np.float32)
    idx = np.stack(np.meshgrid(*[np.arange(n) for n in spatial],
                               indexing="ij"), -1).reshape(-1, 3)
    pts = idx / (np.array(spatial) - 1.0)
    out = np.asarray(multilinear_interp(jnp.asarray(grid),
                                        jnp.asarray(pts.astype(np.float32))))
    np.testing.assert_allclose(out, grid.reshape(-1, 2), rtol=1e-5, atol=1e-5)


def test_linear_function_reproduced_exactly():
    # Multilinear interp reproduces any (multi)linear function exactly.
    spatial = (5, 7)
    axes = [np.linspace(0, 1, n) for n in spatial]
    X, Y = np.meshgrid(*axes, indexing="ij")
    grid = (2.0 * X - 3.0 * Y + 0.5)[..., None].astype(np.float32)
    rng = np.random.RandomState(4)
    pts = rng.rand(50, 2).astype(np.float32)
    out = np.asarray(multilinear_interp(jnp.asarray(grid), jnp.asarray(pts)))
    want = (2.0 * pts[:, :1] - 3.0 * pts[:, 1:2] + 0.5)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_gradient_wrt_points_matches_fd():
    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.RandomState(5)
        grid = jnp.asarray(rng.randn(6, 6, 6, 4))

        def f(p):
            return multilinear_interp(grid, p[None])[0].sum()

        # Interior point away from cell faces (field is C0 at faces).
        p0 = jnp.asarray(np.array([0.33, 0.47, 0.61]))
        g = jax.grad(f)(p0)
        eps = 1e-6
        for d in range(3):
            e = np.zeros(3); e[d] = eps
            fd = (f(p0 + e) - f(p0 - e)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(g)[d], fd, rtol=1e-4)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_corner_offsets_static():
    offs = corner_offsets(3)
    assert offs.shape == (8, 3)
    assert offs.dtype == np.int32
    assert set(map(tuple, offs)) == {(a, b, c) for a in (0, 1)
                                     for b in (0, 1) for c in (0, 1)}


def test_jit_and_vmap_compose():
    rng = np.random.RandomState(6)
    grids = jnp.asarray(rng.randn(2, 4, 4, 4, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 32, 3).astype(np.float32))
    f = jax.jit(jax.vmap(lambda g, p: multilinear_interp(g, p)))
    out = f(grids, pts)
    assert out.shape == (2, 32, 8)
    single = multilinear_interp(grids[0], pts[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single),
                               rtol=1e-6, atol=1e-6)
