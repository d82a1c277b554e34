"""M3 query-engine tests: analytic identities + torch oracle parity."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.ops import multilinear_interp


def test_identity_decoder_reduces_to_multilinear_interp():
    # If the decoder returns the latent part untouched, the blended
    # output is exactly multilinear interpolation of the latent grid.
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(2, 4, 5, 6, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, 33, 3).astype(np.float32))

    out = query_local_implicit_grid(lambda x: x[..., 3:], grid, pts)
    want = jax.vmap(lambda g, p: multilinear_interp(g, p))(grid, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_rel_coord_decoder_blends_to_zero():
    # Multilinear-weighted average of the signed corner offsets is 0:
    # sum_k w_k (frac - o_k) = frac - E[o] = 0.
    rng = np.random.RandomState(1)
    grid = jnp.asarray(rng.randn(1, 4, 4, 4, 2).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 50, 3).astype(np.float32))
    out = query_local_implicit_grid(lambda x: x[..., :3], grid, pts)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


def test_query_matches_torch_oracle_end_to_end():
    from torch_oracle import TorchImNet, torch_query_local_implicit_grid

    C, nf = 8, 4
    model = ImNet(dim=3, in_features=C, out_features=4, nf=nf)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3 + C)))

    rng = np.random.RandomState(2)
    grid = rng.randn(2, 4, 6, 5, C).astype(np.float32)
    pts = rng.rand(2, 40, 3).astype(np.float32)

    got = np.asarray(query_local_implicit_grid(
        lambda x: model.apply(params, x), jnp.asarray(grid),
        jnp.asarray(pts)))

    tmodel = TorchImNet(dim=3, in_features=C, out_features=4, nf=nf)
    tmodel.load_from_flax(params["params"])
    want = torch_query_local_implicit_grid(
        tmodel, torch.from_numpy(grid), torch.from_numpy(pts))
    np.testing.assert_allclose(got, want.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_query_is_differentiable_wrt_points():
    """[slow: point-derivative correctness stays default-covered
    analytically by the jet tests (test_query_jet_matches_towers...),
    which validate d(value)/d(points) exactly]"""
    C = 4
    model = ImNet(dim=3, in_features=C, out_features=2, nf=2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3 + C)))
    rng = np.random.RandomState(3)
    grid = jnp.asarray(rng.randn(1, 4, 4, 4, C).astype(np.float32))
    pts = jnp.asarray(np.array([[[0.31, 0.42, 0.53]]], np.float32))

    def f(p):
        return query_local_implicit_grid(
            lambda x: model.apply(params, x), grid, p).sum()

    g = jax.grad(f)(pts)
    assert g.shape == pts.shape
    assert np.all(np.isfinite(np.asarray(g)))
    # Forward-mode too (the PDE layer uses jvp).
    _, tangent = jax.jvp(f, (pts,), (jnp.ones_like(pts),))
    assert np.isfinite(float(tangent))


def test_query_nonunit_domain():
    rng = np.random.RandomState(4)
    grid = jnp.asarray(rng.randn(1, 4, 5, 6, 3).astype(np.float32))
    xmin = np.array([0.0, -2.0, 1.0], np.float32)
    xmax = np.array([1.0, 2.0, 4.0], np.float32)
    pts01 = rng.rand(1, 20, 3).astype(np.float32)
    pts = pts01 * (xmax - xmin) + xmin

    out_a = query_local_implicit_grid(lambda x: x[..., 3:], grid,
                                      jnp.asarray(pts), xmin, xmax)
    out_b = query_local_implicit_grid(lambda x: x[..., 3:], grid,
                                      jnp.asarray(pts01))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-4, atol=1e-5)
