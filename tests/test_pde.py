"""M4 PDE layer tests: analytic derivative checks, DSL semantics,
normalization scaling, RB2D manufactured solutions, and a torch
second-order-autograd oracle through the full query stack."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.physics import PDELayer, get_rb2_pde_layer


def _analytic_fwd(coords):
    """u = sin(2 pi x) * cos(3 z) * exp(-t); w = x**2 * z + t."""
    t, z, x = coords[..., 0], coords[..., 1], coords[..., 2]
    u = jnp.sin(2 * jnp.pi * x) * jnp.cos(3 * z) * jnp.exp(-t)
    w = x ** 2 * z + t
    return jnp.stack([u, w], axis=-1)


def _rand_coords(n=40, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(n, 3).astype(np.float32))


def test_first_and_second_derivatives_analytic():
    layer = PDELayer(in_vars="t, z, x", out_vars="u, w")
    layer.add_equation("dif(u, t)", name="u_t")
    layer.add_equation("dif(u, x)", name="u_x")
    layer.add_equation("dif(dif(u, x), x)", name="u_xx")
    layer.add_equation("dif(w, z)", name="w_z")
    layer.add_equation("dif(dif(w, x), z)", name="w_xz")
    layer.update_forward_method(_analytic_fwd)

    coords = _rand_coords()
    res = layer(coords)
    t, z, x = [np.asarray(coords[..., i]) for i in range(3)]
    u = np.sin(2 * np.pi * x) * np.cos(3 * z) * np.exp(-t)

    np.testing.assert_allclose(np.asarray(res["u_t"]), -u, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res["u_x"]),
        2 * np.pi * np.cos(2 * np.pi * x) * np.cos(3 * z) * np.exp(-t),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res["u_xx"]),
                               -(2 * np.pi) ** 2 * u, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res["w_z"]), x ** 2,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["w_xz"]), 2 * x,
                               rtol=1e-4, atol=1e-5)


def test_product_rule_and_lhs_rhs_form():
    layer = PDELayer(in_vars="t, z, x", out_vars="u, w")
    # dif of a product must expand via the chain rule symbolically.
    layer.add_equation("dif(u*w, x) = dif(u, x)*w + u*dif(w, x)",
                       name="leibniz")
    layer.update_forward_method(_analytic_fwd)
    res = layer(_rand_coords(seed=1))
    np.testing.assert_allclose(np.asarray(res["leibniz"]), 0.0, atol=1e-4)


def test_coordinate_symbols_in_equations():
    layer = PDELayer(in_vars="t, z, x", out_vars="u, w")
    # Forcing term uses the raw coordinate: w - x**2*z - t == 0.
    layer.add_equation("w - x**2*z - t", name="forcing")
    layer.update_forward_method(_analytic_fwd)
    res = layer(_rand_coords(seed=2))
    np.testing.assert_allclose(np.asarray(res["forcing"]), 0.0, atol=1e-5)


def test_scaling_matches_unnormalized_reference():
    """Normalized fwd + set_scaling == physical fwd with no scaling."""
    Lt, Lz, Lx = 2.0, 0.5, 4.0
    mean = np.array([0.3, -1.2], np.float32)
    std = np.array([2.5, 0.7], np.float32)

    def fwd_phys(c_phys):
        return _analytic_fwd(c_phys)

    def fwd_norm(c_norm):
        c_phys = c_norm * jnp.asarray([Lt, Lz, Lx])
        return (fwd_phys(c_phys) - mean) / std

    eqs = [("e1", "dif(u, t) + dif(dif(w, x), x) * u"),
           ("e2", "dif(dif(u, z), z) - w + x")]

    ref = PDELayer("t, z, x", "u, w")
    scaled = PDELayer("t, z, x", "u, w")
    for n, e in eqs:
        ref.add_equation(e, n)
        scaled.add_equation(e, n)

    coords_n = _rand_coords(seed=3)
    coords_p = coords_n * jnp.asarray([Lt, Lz, Lx])

    ref.update_forward_method(fwd_phys)
    want = ref(coords_p)

    scaled.update_forward_method(fwd_norm)
    scaled.set_scaling(coord_scales=(Lt, Lz, Lx), out_means=mean,
                       out_stds=std)
    got = scaled(coords_n)

    for n, _ in eqs:
        np.testing.assert_allclose(np.asarray(got[n]), np.asarray(want[n]),
                                   rtol=5e-3, atol=5e-3)


def test_rb2_continuity_on_divergence_free_field():
    def fwd(coords):
        t, z, x = coords[..., 0], coords[..., 1], coords[..., 2]
        # Streamfunction psi = sin(x) sin(z): u = dpsi/dz, w = -dpsi/dx.
        u = jnp.sin(x) * jnp.cos(z)
        w = -jnp.cos(x) * jnp.sin(z)
        p = jnp.zeros_like(x)
        b = jnp.zeros_like(x)
        return jnp.stack([p, b, u, w], axis=-1)

    layer = get_rb2_pde_layer()
    layer.update_forward_method(fwd)
    res = layer(_rand_coords(seed=4))
    np.testing.assert_allclose(np.asarray(res["continuity"]), 0.0, atol=1e-5)
    assert set(res) == {"continuity", "temperature", "momentum_x",
                        "momentum_z"}


def test_rb2_equations_vs_sympy_oracle():
    """Full four-equation residuals vs an independent sympy evaluation."""
    import sympy as sp

    Ra, Pr = 1e6, 1.0
    P = (Ra * Pr) ** -0.5
    R = (Ra / Pr) ** -0.5
    ts, zs, xs = sp.symbols("t z x")
    p_e = sp.sin(xs) * sp.cos(zs) * sp.exp(-ts) * sp.Rational(1, 2)
    b_e = sp.cos(xs) * zs ** 2
    u_e = sp.sin(xs + zs) * sp.exp(-2 * ts)
    w_e = xs * zs * sp.cos(ts)

    def D(f, *vs):
        return sp.diff(f, *vs)

    oracle_exprs = {
        "continuity": D(u_e, xs) + D(w_e, zs),
        "temperature": (D(b_e, ts) - P * (D(b_e, xs, 2) + D(b_e, zs, 2))
                        + u_e * D(b_e, xs) + w_e * D(b_e, zs)),
        "momentum_x": (D(u_e, ts) - R * (D(u_e, xs, 2) + D(u_e, zs, 2))
                       + D(p_e, xs) + u_e * D(u_e, xs) + w_e * D(u_e, zs)),
        "momentum_z": (D(w_e, ts) - R * (D(w_e, xs, 2) + D(w_e, zs, 2))
                       + D(p_e, zs) - b_e + u_e * D(w_e, xs)
                       + w_e * D(w_e, zs)),
    }
    oracle_fns = {k: sp.lambdify((ts, zs, xs), v, "numpy")
                  for k, v in oracle_exprs.items()}

    def fwd(coords):
        t, z, x = coords[..., 0], coords[..., 1], coords[..., 2]
        p = jnp.sin(x) * jnp.cos(z) * jnp.exp(-t) / 2
        b = jnp.cos(x) * z ** 2
        u = jnp.sin(x + z) * jnp.exp(-2 * t)
        w = x * z * jnp.cos(t)
        return jnp.stack([p, b, u, w], axis=-1)

    layer = get_rb2_pde_layer(rayleigh=Ra, prandtl=Pr)
    layer.update_forward_method(fwd)
    coords = _rand_coords(seed=5)
    res = layer(coords)
    t, z, x = [np.asarray(coords[..., i]).astype(np.float64)
               for i in range(3)]
    for k in oracle_exprs:
        np.testing.assert_allclose(np.asarray(res[k]),
                                   oracle_fns[k](t, z, x),
                                   rtol=2e-3, atol=2e-3)


def test_second_derivative_through_query_matches_torch_autograd():
    """u_xx through the FULL latent-grid query stack vs torch autograd
    with create_graph=True (the reference's mechanism)."""
    from torch_oracle import TorchImNet, torch_query_local_implicit_grid

    C, nf = 4, 2
    model = ImNet(dim=3, in_features=C, out_features=4, nf=nf)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3 + C)))
    rng = np.random.RandomState(6)
    grid = rng.randn(1, 3, 4, 4, C).astype(np.float32)
    # Strictly interior points, away from cell faces.
    pts = (0.3 + 0.2 * rng.rand(1, 16, 3)).astype(np.float32)

    def fwd(coords):
        return query_local_implicit_grid(
            lambda v: model.apply(params, v), jnp.asarray(grid), coords)

    layer = PDELayer("t, z, x", "p, b, u, w")
    layer.add_equation("dif(u, x)", name="u_x")
    layer.add_equation("dif(dif(u, x), x)", name="u_xx")
    layer.update_forward_method(fwd)
    res = layer(jnp.asarray(pts))

    tmodel = TorchImNet(dim=3, in_features=C, out_features=4, nf=nf)
    tmodel.load_from_flax(params["params"])
    tpts = torch.from_numpy(pts).requires_grad_(True)
    tout = torch_query_local_implicit_grid(
        tmodel, torch.from_numpy(grid), tpts)          # [1, 16, 4]
    u = tout[..., 2]
    gu = torch.autograd.grad(u.sum(), tpts, create_graph=True)[0]
    u_x = gu[..., 2]
    u_xx = torch.autograd.grad(u_x.sum(), tpts, create_graph=True)[0][..., 2]

    np.testing.assert_allclose(np.asarray(res["u_x"]),
                               u_x.detach().numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res["u_xx"]),
                               u_xx.detach().numpy(), rtol=5e-3, atol=5e-4)


def test_residual_loss_and_jit():
    layer = get_rb2_pde_layer()
    layer.update_forward_method(
        lambda c: jnp.stack([c[..., 0]] * 4, axis=-1))
    coords = _rand_coords(seed=7)

    @jax.jit
    def loss_fn(c):
        total, per_eq = layer.residual_loss(c)
        return total

    out = loss_fn(coords)
    assert np.isfinite(float(out))


def test_residual_loss_huber_bounds_influence():
    """kind='huber': quadratic (== l2/1) for small residuals, LINEAR in
    |r| for large ones — so a residual cliff contributes O(delta) to
    the gradient instead of O(r) (the round-2 spike pathology)."""
    layer = get_rb2_pde_layer()
    scale_holder = {"s": 1.0}
    layer.update_forward_method(
        lambda c: scale_holder["s"] * jnp.stack(
            [jnp.sin(c[..., 0]), c[..., 1] ** 2,
             c[..., 2], c[..., 0] * c[..., 1]], axis=-1))
    coords = _rand_coords(seed=3)

    l2, _ = layer.residual_loss(coords, kind="l2")
    hu, _ = layer.residual_loss(coords, kind="huber", huber_delta=1e6)
    # Far below delta the huber penalty is exactly half the square.
    np.testing.assert_allclose(float(hu), 0.5 * float(l2), rtol=1e-5)

    # Huge residuals: huber grows ~linearly, l2 quadratically.
    scale_holder["s"] = 1e6
    l2_big, _ = layer.residual_loss(coords, kind="l2")
    hu_big, _ = layer.residual_loss(coords, kind="huber")
    # huber ~ delta*mean|r| vs l2 ~ mean r^2: orders of magnitude
    # smaller once residuals blow past delta.
    assert float(hu_big) < 1e-6 * float(l2_big)
    res = layer(coords)
    l1_sum = sum(float(jnp.mean(jnp.abs(r))) for r in res.values())
    np.testing.assert_allclose(float(hu_big), l1_sum, rtol=1e-3)

    import pytest
    with pytest.raises(ValueError, match="unknown pde loss kind"):
        layer.residual_loss(coords, kind="l3")
