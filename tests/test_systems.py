"""Pluggable PDE system tests (config #4): NS2D and advection-diffusion
residuals vanish on manufactured exact solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.physics.systems import (
    available_systems, get_pde_layer, register_system,
)


def _coords(n=40, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(n, 3).astype(np.float32))


def test_registry():
    assert {"rb2d", "ns2d", "advection_diffusion"} <= set(
        available_systems())
    with pytest.raises(KeyError):
        get_pde_layer("nope")


def test_ns2d_taylor_green_exact():
    nu = 1e-2

    def fwd(coords):
        t, z, x = coords[..., 0], coords[..., 1], coords[..., 2]
        F = jnp.exp(-2 * nu * t)
        u = jnp.sin(x) * jnp.cos(z) * F
        w = -jnp.cos(x) * jnp.sin(z) * F
        p = 0.25 * (jnp.cos(2 * x) + jnp.cos(2 * z)) * F ** 2
        b = jnp.zeros_like(x)
        return jnp.stack([p, b, u, w], axis=-1)

    layer = get_pde_layer("ns2d", viscosity=nu)
    layer.update_forward_method(fwd)
    res = layer(_coords(seed=1))
    for name in ("continuity", "momentum_x", "momentum_z", "scalar"):
        np.testing.assert_allclose(np.asarray(res[name]), 0.0, atol=5e-5)


def test_advection_diffusion_exact():
    kappa, cx, cz = 0.05, 1.0, -0.5

    def fwd(coords):
        t, z, x = coords[..., 0], coords[..., 1], coords[..., 2]
        # b = exp(-2 kappa t) sin(x - cx t) cos(z - cz t) solves it.
        b = jnp.exp(-2 * kappa * t) * jnp.sin(x - cx * t) * \
            jnp.cos(z - cz * t)
        zero = jnp.zeros_like(b)
        return jnp.stack([zero, b, zero, zero], axis=-1)

    layer = get_pde_layer("advection_diffusion", diffusivity=kappa,
                          velocity=(cx, cz))
    layer.update_forward_method(fwd)
    res = layer(_coords(seed=2))
    np.testing.assert_allclose(np.asarray(res["advection_diffusion"]),
                               0.0, atol=5e-5)


def test_register_custom_system():
    from space_time_pde_tpu.physics.pde import PDELayer

    def factory(**kw):
        layer = PDELayer("t, z, x", "p, b, u, w")
        layer.add_equation("dif(b, t)", name="static")
        return layer

    register_system("custom_test", factory)
    layer = get_pde_layer("custom_test")
    layer.update_forward_method(
        lambda c: jnp.stack([c[..., 2]] * 4, axis=-1))
    res = layer(_coords(seed=3))
    np.testing.assert_allclose(np.asarray(res["static"]), 0.0, atol=1e-6)


def test_rb2d_via_registry_matches_direct():
    from space_time_pde_tpu.physics import get_rb2_pde_layer

    layer_a = get_pde_layer("rb2d", rayleigh=1e4, prandtl=1.0)
    layer_b = get_rb2_pde_layer(rayleigh=1e4, prandtl=1.0)
    fwd = lambda c: jnp.stack(
        [jnp.sin(c[..., 0] + i) * c[..., 2] for i in range(4)], axis=-1)
    layer_a.update_forward_method(fwd)
    layer_b.update_forward_method(fwd)
    ra, rb = layer_a(_coords(seed=4)), layer_b(_coords(seed=4))
    for k in ra:
        np.testing.assert_allclose(np.asarray(ra[k]), np.asarray(rb[k]),
                                   rtol=1e-6)
