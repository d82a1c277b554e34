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
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 2, 2, 2, 2, 6)


def test_unet4d_same_resolution_output():
    m = UNet4d(in_features=4, out_features=8, igres=(4, 4, 4, 8), nf=8)
    x = jnp.ones((1, 4, 4, 4, 8, 4))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
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
    params = jax.jit(model.init)(jax.random.PRNGKey(1),
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


@pytest.mark.slow
def test_4d_end_to_end_train_step():
    """[slow: the 4-D train-step library path stays default-covered by
    test_turb3d_train_cli_smoke] UNet4d -> 16-corner query -> ns3d
    residuals -> grads, one step."""
    import optax

    igres = (4, 4, 4, 4)
    unet = UNet4d(in_features=4, out_features=4, igres=igres, nf=8)
    imnet = ImNet(dim=4, in_features=4, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    lres = jnp.asarray(np.random.RandomState(4).randn(
        1, *igres, 4).astype(np.float32))
    params = {
        "unet": jax.jit(unet.init)(key, lres)["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 8)))["params"],
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


def test_abc_generator_and_4d_dataset(tmp_path):
    from space_time_pde_tpu.data import Field4DDataset, abc_flow_fields, \
        save_npz

    fields = abc_flow_fields(nt=12, nz=16, ny=16, nx=16, viscosity=0.05)
    # Exact incompressibility (spectral identity) at collocation pts:
    # FD check on the analytic fields.
    u, v, w = fields["u"], fields["v"], fields["w"]
    dx = float(fields["dx"])
    div = ((np.roll(u, -1, 3) - np.roll(u, 1, 3))
           + (np.roll(v, -1, 2) - np.roll(v, 1, 2))
           + (np.roll(w, -1, 1) - np.roll(w, 1, 1))) / (2 * dx)
    assert np.abs(div).max() < 0.02  # 2nd-order FD error bound

    save_npz(str(tmp_path / "abc.npz"), fields)
    ds = Field4DDataset(
        data_folder=str(tmp_path), data_filename="abc.npz",
        nt=8, nz=8, ny=8, nx=8, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xyz=2)
    item = ds[0]
    assert item["lres"].shape == (4, 4, 4, 4, 4)
    assert item["point_coord"].shape == (32, 4)
    assert item["point_value"].shape == (32, 4)
    batch = ds.sample_batch(np.random.RandomState(0), 2)
    assert batch["lres"].shape == (2, 4, 4, 4, 4, 4)
    et = ds.coord_extents
    assert len(et) == 4 and et[0] == pytest.approx(7 * 0.1)


@pytest.mark.slow
def test_4d_pipeline_trains_on_abc_data(tmp_path):
    """[slow: full 4-D driver pipeline on ABC data; the 4-D train-step
    graph itself stays default via test_4d_end_to_end_train_step]
    Full 4-D slice: ABC data -> UNet4d -> 16-corner query -> ns3d
    physics loss -> a few optimizer steps reduce the loss."""
    import optax
    from space_time_pde_tpu.data import Field4DDataset, abc_flow_fields, \
        save_npz

    save_npz(str(tmp_path / "abc.npz"),
             abc_flow_fields(nt=12, nz=16, ny=16, nx=16, viscosity=0.05))
    ds = Field4DDataset(
        data_folder=str(tmp_path), data_filename="abc.npz",
        nt=8, nz=8, ny=8, nx=8, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xyz=2)

    unet = UNet4d(in_features=4, out_features=4, igres=ds.lres_shape,
                  nf=4)
    imnet = ImNet(dim=4, in_features=4, out_features=4, nf=1)
    key = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in
             ds.sample_batch(np.random.RandomState(0), 1).items()}
    params = {
        "unet": jax.jit(unet.init)(key, batch["lres"])["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 8)))["params"],
    }
    et, ez, ey, ex = ds.coord_extents
    pde = get_pde_layer("ns3d", mean=ds.channel_mean,
                        std=ds.channel_std, t_crop=et, z_crop=ez,
                        y_crop=ey, x_crop=ex, viscosity=0.05)

    def loss_fn(p):
        latent = unet.apply({"params": p["unet"]}, batch["lres"])
        fwd = lambda pts: query_local_implicit_grid(
            lambda vv: imnet.apply({"params": p["imnet"]}, vv),
            latent, pts)
        reg = jnp.mean(jnp.square(fwd(batch["point_coord"])
                                  - batch["point_value"]))
        pde_total, _ = pde.residual_loss(batch["point_coord"], fwd=fwd)
        return reg + 0.01 * pde_total

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = jax.jit(lambda p, o: _update(p, o, loss_fn, tx))
    first = None
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.9 * first, (first, float(loss))


def _update(params, opt_state, loss_fn, tx):
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    import optax as _optax
    return _optax.apply_updates(params, updates), opt_state, loss


def test_4d_jnp_query_tpu_guard(monkeypatch):
    """On TPU the 16-corner jnp query/jet must raise a clear error
    instead of hitting the environment's XLA:TPU compiler segfault
    (BASELINE.md config #5 notes); CPU keeps working."""
    import jax

    from space_time_pde_tpu.models import query_local_implicit_grid
    from space_time_pde_tpu.ops.jet import query_local_implicit_grid_jet

    latent = jnp.zeros((1, 3, 3, 3, 3, 2))
    pts = jnp.full((1, 5, 4), 0.5)
    dec = lambda v: v[..., :1]

    # CPU: both paths run.
    out = query_local_implicit_grid(dec, latent, pts)
    assert out.shape == (1, 5, 1)
    v, j, h = query_local_implicit_grid_jet(dec, latent, pts)
    assert v.shape == (1, 5, 1)

    class FakeDev:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [FakeDev()])
    with pytest.raises(NotImplementedError, match="fused"):
        query_local_implicit_grid(dec, latent, pts)
    with pytest.raises(NotImplementedError, match="fused"):
        query_local_implicit_grid_jet(dec, latent, pts)
