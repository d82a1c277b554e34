"""4-D space-time support (config #5): UNet4d encoder, 16-corner query
path, fused kernel in 4-D, and the ns3d physics system on an exact
decaying ABC (Beltrami) Navier-Stokes solution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.models.unet4d import Conv4d, UNet4d
from space_time_pde_tpu.ops import multilinear_interp
from space_time_pde_tpu.physics.systems import get_pde_layer


def test_conv4d_shapes_and_stride():
    m = Conv4d(6, strides=(2, 2, 2, 2))
    x = jnp.ones((2, 4, 4, 4, 4, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 2, 2, 2, 2, 6)


def test_unet4d_same_resolution_output():
    m = UNet4d(in_features=4, out_features=8, igres=(4, 4, 4, 8), nf=8)
    x = jnp.ones((1, 4, 4, 4, 8, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(m.apply)(params, x)
    assert out.shape == (1, 4, 4, 4, 8, 8)
    assert m.levels == 2


def test_4d_query_identity_decoder():
    # 2^4 = 16 corners; identity decoder reduces to 4-D multilinear.
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(1, 3, 4, 5, 4, 6).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 25, 4).astype(np.float32))
    out = query_local_implicit_grid(lambda v: v[..., 4:], grid, pts)
    want = multilinear_interp(grid[0], pts[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_4d_imnet_query_and_fused_parity():
    from space_time_pde_tpu.ops.fused_query import (
        fused_query_local_implicit_grid,
    )

    C = 4
    model = ImNet(dim=4, in_features=C, out_features=4, nf=2)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.ones((1, 4 + C)))["params"]
    rng = np.random.RandomState(2)
    grid = jnp.asarray(rng.randn(1, 3, 3, 4, 4, C).astype(np.float32))
    pts = jnp.asarray(rng.rand(1, 30, 4).astype(np.float32))

    want = query_local_implicit_grid(
        lambda v: model.apply({"params": params}, v), grid, pts)
    got = fused_query_local_implicit_grid(
        model, params, grid, pts, compute_dtype=jnp.float32,
        block_pts=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ns3d_abc_flow_exact():
    """Decaying ABC flow is an exact Beltrami solution of 3-D NS:
    u x omega = 0, lap(u) = -u, p = -|u|^2/2, decay exp(-nu t)."""
    nu = 0.05
    A, B, C = 1.0, 0.7, 0.3

    def fwd(coords):
        t, z, y, x = [coords[..., i] for i in range(4)]
        F = jnp.exp(-nu * t)
        u = (A * jnp.sin(z) + C * jnp.cos(y)) * F
        v = (B * jnp.sin(x) + A * jnp.cos(z)) * F
        w = (C * jnp.sin(y) + B * jnp.cos(x)) * F
        p = -0.5 * (u ** 2 + v ** 2 + w ** 2)
        return jnp.stack([p, u, v, w], axis=-1)

    layer = get_pde_layer("ns3d", viscosity=nu)
    layer.update_forward_method(fwd)
    rng = np.random.RandomState(3)
    coords = jnp.asarray(rng.rand(40, 4).astype(np.float32))
    res = layer(coords)
    for name in ("continuity", "momentum_x", "momentum_y", "momentum_z"):
        np.testing.assert_allclose(np.asarray(res[name]), 0.0, atol=1e-4)


def test_4d_end_to_end_train_step():
    """UNet4d -> 16-corner query -> ns3d residuals -> grads, one step."""
    import optax

    igres = (4, 4, 4, 4)
    unet = UNet4d(in_features=4, out_features=4, igres=igres, nf=8)
    imnet = ImNet(dim=4, in_features=4, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    lres = jnp.asarray(np.random.RandomState(4).randn(
        1, *igres, 4).astype(np.float32))
    params = {
        "unet": unet.init(key, lres)["params"],
        "imnet": imnet.init(key, jnp.zeros((1, 8)))["params"],
    }
    coords = jnp.asarray(np.random.RandomState(5).rand(
        1, 16, 4).astype(np.float32))
    values = jnp.asarray(np.random.RandomState(6).randn(
        1, 16, 4).astype(np.float32))
    pde = get_pde_layer("ns3d", viscosity=1e-2)

    def loss_fn(p):
        latent = unet.apply({"params": p["unet"]}, lres)
        fwd = lambda pts: query_local_implicit_grid(
            lambda v: imnet.apply({"params": p["imnet"]}, v), latent, pts)
        reg = jnp.mean(jnp.square(fwd(coords) - values))
        pde_total, _ = pde.residual_loss(coords, fwd=fwd)
        return reg + 0.01 * pde_total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
