"""Fused Pallas jet kernel parity vs the jnp analytic jet (ops/jet.py).

Runs in interpret mode on CPU (the TPU lowering is exercised by
bench/training on hardware). Checks:
- forward: value/jac/hess equal the jnp jet;
- backward: grads w.r.t. ImNet params AND the latent grid through a
  scalar loss touching value + jac + hess equal the jnp jet's grads;
- the full query wrapper (gather + dfrac scaling) against
  ops.jet.query_local_implicit_grid_jet, including edge points.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.models import ImNet
from space_time_pde_tpu.ops.fused_jet import fused_query_jet
from space_time_pde_tpu.ops.jet import query_local_implicit_grid_jet

jax.config.update("jax_enable_x64", False)


def _setup(nf=2, lat=8, out=4, dim=3, seed=0):
    imnet = ImNet(dim=dim, in_features=lat, out_features=out, nf=nf)
    key = jax.random.PRNGKey(seed)
    params = jax.jit(imnet.init)(key, jnp.zeros((1, dim + lat)))["params"]
    return imnet, params


def _fused(imnet, params, latent, pts, block_pts=16, pad_to=16):
    # pad_to=16 keeps interpret-mode wall time sane for the tiny test
    # widths; one forward case below runs the production pad_to=128
    # packing (padded lanes must carry exact zeros either way).
    # jitted: interpret-mode pallas lowers to plain XLA ops, so the
    # compiled (cache-persisted) program replaces an eager op-by-op
    # walk of the simulated kernel.
    return jax.jit(lambda p, l, q: fused_query_jet(
        imnet, p, l, q, block_pts=block_pts, pad_to=pad_to,
        compute_dtype=jnp.float32, interpret=True))(params, latent, pts)


def _jnp_jet(imnet, params, latent, pts):
    dec = lambda v: imnet.apply({"params": params}, v)
    return jax.jit(lambda l, q: query_local_implicit_grid_jet(
        dec, l, q))(latent, pts)


@pytest.mark.parametrize("n,block,pad", [(32, 16, 128), (23, 16, 16),
                                         (5, 8, 16)])
def test_fused_jet_forward_parity(n, block, pad):
    imnet, params = _setup()
    rng = np.random.RandomState(0)
    latent = jnp.asarray(rng.randn(2, 4, 5, 6, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(2, n, 3).astype(np.float32))

    v1, j1, h1 = _fused(imnet, params, latent, pts, block, pad_to=pad)
    v2, j2, h2 = _jnp_jet(imnet, params, latent, pts)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-3)


def test_fused_jet_4d_parity():
    """dim=4 (turb3d): 16 corner rows, 4 stacked tangent chains, 15 jet
    blocks — value/jac/hess match the jnp jet."""
    imnet, params = _setup(nf=2, lat=4, out=2, dim=4, seed=5)
    rng = np.random.RandomState(4)
    latent = jnp.asarray(rng.randn(1, 3, 3, 4, 4, 4).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 10, 4).astype(np.float32))
    v1, j1, h1 = _fused(imnet, params, latent, pts, block_pts=8)
    v2, j2, h2 = _jnp_jet(imnet, params, latent, pts)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-3)


def test_fused_jet_relu_activation_parity():
    """--activation relu must compute relu math in the fused kernel
    (slope-0 masks), not silently reuse leaky_relu's 0.01 slope."""
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2,
                  activation="relu")
    key = jax.random.PRNGKey(7)
    params = jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"]
    rng = np.random.RandomState(6)
    latent = jnp.asarray(rng.randn(1, 3, 4, 4, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 16, 3).astype(np.float32))
    v1, j1, h1 = _fused(imnet, params, latent, pts, block_pts=8)
    v2, j2, h2 = _jnp_jet(imnet, params, latent, pts)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-3)
    # And a non-piecewise-linear activation is rejected outright.
    from space_time_pde_tpu.ops.fused_jet import make_fused_jet
    with pytest.raises(ValueError, match="piecewise-linear"):
        make_fused_jet(nf=2, n_corners=8, dim=3, out_dim=4,
                       activation="gelu")


def test_fused_jet_edge_points_parity():
    """Domain-boundary clamps: points at/outside [0,1] hit clamped
    cells and zero dfrac exactly like the jnp jet."""
    imnet, params = _setup(seed=3)
    rng = np.random.RandomState(1)
    latent = jnp.asarray(rng.randn(1, 3, 4, 4, 8).astype(np.float32))
    pts = jnp.asarray(np.array([[
        [0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.0, 0.5, 1.0],
        [1.2, -0.1, 0.5], [0.999, 0.001, 0.5],
    ]], np.float32))
    v1, j1, h1 = _fused(imnet, params, latent, pts, block_pts=8)
    v2, j2, h2 = _jnp_jet(imnet, params, latent, pts)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=2e-4, atol=2e-3)


def test_fused_jet_gradients_match_jnp_jet():
    """Backward kernel: d loss / d params and d loss / d latent for a
    loss mixing value, jac and hess (as the PDE residual loss does)."""
    imnet, params = _setup(nf=2, lat=8)
    rng = np.random.RandomState(2)
    latent = jnp.asarray(rng.randn(1, 3, 4, 5, 8).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 24, 3).astype(np.float32))
    cv = jnp.asarray(rng.randn(1, 24, 4).astype(np.float32))
    cj = jnp.asarray(rng.randn(1, 24, 4, 3).astype(np.float32))
    ch = jnp.asarray(rng.randn(1, 24, 4, 3, 3).astype(np.float32))

    def loss(fn, params, latent):
        v, j, h = fn(imnet, params, latent, pts)
        return (jnp.sum(v * cv) + jnp.sum(j * cj)
                + jnp.sum(h * ch))

    def jnp_fn(imnet, params, latent, pts):
        dec = lambda v: imnet.apply({"params": params}, v)
        return query_local_implicit_grid_jet(dec, latent, pts)

    fused_fn = functools.partial(_fused, block_pts=8)
    # jit: interpret-mode pallas lowers to plain XLA ops, so the
    # compiled (and cache-persisted) program replaces an eager op-by-op
    # walk of the simulated kernel.
    g1p, g1l = jax.jit(jax.grad(functools.partial(loss, fused_fn),
                                argnums=(0, 1)))(params, latent)
    g2p, g2l = jax.jit(jax.grad(functools.partial(loss, jnp_fn),
                                argnums=(0, 1)))(params, latent)

    np.testing.assert_allclose(np.asarray(g1l), np.asarray(g2l),
                               rtol=3e-4, atol=3e-3)
    flat1 = jax.tree_util.tree_leaves_with_path(g1p)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2p))
    for path, leaf in flat1:
        want = flat2[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(want), rtol=3e-4, atol=5e-3,
            err_msg=f"param grad mismatch at {path}")


def test_fused_jet_in_training_loss():
    """The fused jet slots into make_loss_fn's jet consumption: residual
    loss and param grads match the jnp jet path."""
    from space_time_pde_tpu.physics.systems import get_pde_layer
    from space_time_pde_tpu.models import UNet3d

    imnet, iparams = _setup(nf=2, lat=8)
    unet = UNet3d(in_features=4, out_features=8, igres=(4, 8, 8), nf=4)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    lres = jnp.asarray(rng.randn(2, 4, 8, 8, 4).astype(np.float32))
    params = {"unet": jax.jit(unet.init)(key, lres)["params"], "imnet": iparams}
    coords = jnp.asarray(rng.rand(2, 16, 3).astype(np.float32))
    target = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    pde = get_pde_layer("rb2d", mean=np.zeros(4), std=np.ones(4),
                        t_crop=1.0, z_crop=1.0, x_crop=1.0)

    def loss(params, jet_impl):
        latent = unet.apply({"params": params["unet"]}, lres)
        if jet_impl == "fused":
            pred, jac, hess = fused_query_jet(
                imnet, params["imnet"], latent, coords, block_pts=8,
                pad_to=16, compute_dtype=jnp.float32, interpret=True)
        else:
            dec = lambda v: imnet.apply({"params": params["imnet"]}, v)
            pred, jac, hess = query_local_implicit_grid_jet(
                dec, latent, coords)
        reg = jnp.mean(jnp.abs(pred - target))
        pde_total, _ = pde.residual_loss(coords, fwd=None,
                                         jet=(pred, jac, hess))
        return reg + 0.1 * pde_total

    l1, g1 = jax.jit(jax.value_and_grad(loss),
                     static_argnums=1)(params, "fused")
    l2, g2 = jax.jit(jax.value_and_grad(loss),
                     static_argnums=1)(params, "jnp")
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=5e-3)
