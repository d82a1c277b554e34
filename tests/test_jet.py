"""Analytic-jet parity tests: ops/jet.py vs the nested-jvp towers.

The jet is exact for piecewise-linear decoders (ImNet with LeakyReLU):
value / Jacobian / Hessian must match forward-mode autodiff through the
stock query path (models/local_implicit_grid.py) to float tolerance —
including domain-boundary points and the full normalized PDE loss with
its parameter gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.ops.jet import (
    multilinear_weight_jet,
    query_local_implicit_grid_jet,
)
from space_time_pde_tpu.physics import get_rb2_pde_layer
from space_time_pde_tpu.physics.pde import PDELayer


def _setup(dim=3, n=64, lat=8, nf=4, out=4, seed=0, spatial=None):
    rng = np.random.RandomState(seed)
    spatial = spatial or {2: (5, 6), 3: (4, 5, 6), 4: (3, 4, 3, 5)}[dim]
    grid = jnp.asarray(rng.randn(1, *spatial, lat).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, n, dim).astype(np.float32))
    # Include exact domain-boundary points (the clamp's edge cases).
    pts = pts.at[0, 0].set(0.0)
    pts = pts.at[0, 1].set(1.0)
    pts = pts.at[0, 2, 0].set(1.0)
    imnet = ImNet(dim=dim, in_features=lat, out_features=out, nf=nf)
    params = jax.jit(imnet.init)(jax.random.PRNGKey(seed),
                        jnp.zeros((1, dim + lat)))["params"]
    decoder = lambda v: imnet.apply({"params": params}, v)
    return grid, pts, decoder, imnet, params


def _tower_jet(decoder, grid, pts, dim):
    """Reference value/jac/hess via nested jvp through the stock query.
    jitted: the tower graph executed eagerly op-by-op on CPU is ~10x
    slower than the compiled program (cache-persistent across runs)."""
    fwd = lambda p: query_local_implicit_grid(decoder, grid, p)

    def compute(pts):
        def tangent(axis):
            t = jnp.zeros_like(pts)
            return t.at[..., axis].set(1.0)

        value = fwd(pts)
        jac = jnp.stack(
            [jax.jvp(fwd, (pts,), (tangent(a),))[1] for a in range(dim)],
            axis=-1)

        def d1(a):
            return lambda p: jax.jvp(fwd, (p,), (tangent(a),))[1]

        hess = jnp.stack([
            jnp.stack([jax.jvp(d1(a), (pts,), (tangent(b),))[1]
                       for b in range(dim)], axis=-1)
            for a in range(dim)], axis=-2)
        return value, jac, hess

    return jax.jit(compute)(pts)


def test_weight_jet_matches_autodiff():
    rng = np.random.RandomState(3)
    for dim in (1, 2, 3, 4):
        frac = jnp.asarray(rng.rand(17, dim).astype(np.float32))
        w, dw, d2w = multilinear_weight_jet(frac)

        def weights(f):
            from space_time_pde_tpu.ops.grid_interp import corner_offsets
            offs = jnp.asarray(corner_offsets(dim), f.dtype)
            per = jnp.where(offs[None], f[:, None, :],
                            1.0 - f[:, None, :])
            return jnp.prod(per, axis=-1)

        np.testing.assert_allclose(np.asarray(w), np.asarray(weights(frac)),
                                   rtol=1e-6)
        jac_ad = jax.jacfwd(weights)(frac)   # [N, K, N, D] (diag in N)
        jac_ad = jnp.einsum("nknd->nkd", jac_ad)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(jac_ad),
                                   rtol=1e-5, atol=1e-6)
        hess_ad = jax.jacfwd(jax.jacfwd(weights))(frac)
        hess_ad = jnp.einsum("nknanb->nkab", hess_ad)
        np.testing.assert_allclose(np.asarray(d2w), np.asarray(hess_ad),
                                   rtol=1e-5, atol=1e-6)
        # Partition of unity: weight derivatives sum to zero.
        np.testing.assert_allclose(np.asarray(dw.sum(1)), 0.0, atol=1e-6)


def test_query_jet_matches_towers_3d():
    grid, pts, decoder, _, _ = _setup(dim=3)
    v, j, h = jax.jit(lambda p: query_local_implicit_grid_jet(
        decoder, grid, p))(pts)
    v0, j0, h0 = _tower_jet(decoder, grid, pts, 3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h0),
                               rtol=1e-4, atol=1e-3)


def test_query_jet_matches_towers_2d_and_4d():
    for dim in (2, 4):
        grid, pts, decoder, _, _ = _setup(dim=dim, n=32, seed=dim)
        v, j, h = jax.jit(lambda p: query_local_implicit_grid_jet(
            decoder, grid, p))(pts)
        v0, j0, h0 = _tower_jet(decoder, grid, pts, dim)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(j), np.asarray(j0),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(h), np.asarray(h0),
                                   rtol=1e-4, atol=1e-3)


def test_pde_residuals_jet_vs_tower():
    """RB2D residuals with non-trivial normalization: jet == towers."""
    grid, pts, decoder, _, _ = _setup(dim=3, n=48, seed=7)
    mean = np.array([0.4, -0.2, 1.1, 0.3], np.float32)
    std = np.array([1.7, 0.6, 2.2, 0.9], np.float32)
    layer = get_rb2_pde_layer(mean=mean, std=std,
                              t_crop=2.0, z_crop=0.5, x_crop=3.0)
    fwd = lambda p: query_local_implicit_grid(decoder, grid, p)
    jet_fn = lambda p: query_local_implicit_grid_jet(decoder, grid, p)

    res_tower = jax.jit(lambda p: layer(p, fwd=fwd))(pts)
    res_jet = jax.jit(lambda p: layer(p, jet=jet_fn))(pts)
    assert set(res_tower) == set(res_jet)
    for name in res_tower:
        np.testing.assert_allclose(
            np.asarray(res_jet[name]), np.asarray(res_tower[name]),
            rtol=1e-4, atol=1e-3, err_msg=name)


def test_jet_rejects_order_above_two():
    layer = PDELayer(in_vars="t, x", out_vars="u")
    layer.add_equation("dif(dif(dif(u, x), x), x)", name="third")
    assert layer.max_derivative_order() == 3
    coords = jnp.zeros((4, 2))
    jet = (jnp.zeros((4, 1)), jnp.zeros((4, 1, 2)), jnp.zeros((4, 1, 2, 2)))
    try:
        layer(coords, jet=jet)
        assert False, "expected ValueError for order-3 system"
    except ValueError:
        pass


def test_loss_and_grads_jet_vs_tower():
    """Full training loss + parameter grads: jet path == tower path."""
    from space_time_pde_tpu.train import build_models
    from space_time_pde_tpu.train.trainer import make_loss_fn
    from space_time_pde_tpu.utils.config import Config

    cfg = Config()
    cfg.model.lat_dims = 8
    cfg.model.unet_nf = 4
    cfg.model.imnet_nf = 4
    cfg.train.alpha_pde = 0.3
    lres_shape = (4, 8, 8)
    unet, imnet = build_models(cfg, lres_shape)
    mean = np.array([0.4, -0.2, 1.1, 0.3], np.float32)
    std = np.array([1.7, 0.6, 2.2, 0.9], np.float32)
    layer = get_rb2_pde_layer(mean=mean, std=std,
                              t_crop=2.0, z_crop=0.5, x_crop=3.0)

    rng = np.random.RandomState(11)
    batch = {
        "lres": jnp.asarray(rng.randn(2, *lres_shape, 4).astype(np.float32)),
        "point_coord": jnp.asarray(rng.rand(2, 24, 3).astype(np.float32)),
        "point_value": jnp.asarray(rng.randn(2, 24, 4).astype(np.float32)),
    }
    key = jax.random.PRNGKey(0)
    params = {
        "unet": jax.jit(unet.init)(key, jnp.zeros((1, *lres_shape, 4)))["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 3 + 8)))["params"],
    }

    losses, grads = {}, {}
    for mode in ("jet", "tower"):
        cfg.train.pde_derivs = mode
        loss_fn = make_loss_fn(cfg, unet, imnet, layer)
        (loss, metrics), g = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(params, batch)
        losses[mode] = float(loss)
        grads[mode] = g
        assert np.isfinite(losses[mode])

    np.testing.assert_allclose(losses["jet"], losses["tower"],
                               rtol=1e-4)
    flat_j, _ = jax.flatten_util.ravel_pytree(grads["jet"])
    flat_t, _ = jax.flatten_util.ravel_pytree(grads["tower"])
    np.testing.assert_allclose(np.asarray(flat_j), np.asarray(flat_t),
                               rtol=1e-3, atol=1e-4)
