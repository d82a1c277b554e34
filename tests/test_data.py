"""M5 data tests: generator physics sanity + dataset pipeline semantics."""

import numpy as np
import pytest

from space_time_pde_tpu.data import (
    RB2DataLoader,
    save_npz,
    simulate_rb2d,
    taylor_green_fields,
)


@pytest.fixture(scope="module")
def tg_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "tg.npz"
    fields = taylor_green_fields(nt=24, nz=32, nx=32, dt=0.05)
    save_npz(str(path), fields)
    return str(path)


def test_taylor_green_satisfies_equations_analytically():
    # Exact solution: check momentum_x residual with spectral accuracy
    # using the analytic derivative forms at sample points.
    nu = 1e-2
    f = taylor_green_fields(nt=8, nz=16, nx=16, viscosity=nu, dt=0.1)
    t = np.arange(8) * 0.1
    z = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    x = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    T, Z, X = np.meshgrid(t, z, x, indexing="ij")
    F = np.exp(-2 * nu * T)
    u, w, p = f["u"], f["w"], f["p"]
    u_t = -2 * nu * u
    u_x = np.cos(X) * np.cos(Z) * F
    u_z = -np.sin(X) * np.sin(Z) * F
    lap_u = -2 * u
    p_x = -0.5 * np.sin(2 * X) * F ** 2
    res = u_t + u * u_x + w * u_z + p_x - nu * lap_u
    assert np.abs(res).max() < 1e-5


def test_rb_simulation_runs_and_is_physical():
    out = simulate_rb2d(nx=32, nz=16, rayleigh=1e4, t_transient=0.5,
                        n_snapshots=4, snap_dt=0.25, seed=0)
    for k in ("p", "b", "u", "w"):
        assert out[k].shape == (4, 16, 32)
        assert np.all(np.isfinite(out[k]))
    # Temperature BCs hold.
    np.testing.assert_allclose(out["b"][:, 0, :], 1.0, atol=1e-6)
    np.testing.assert_allclose(out["b"][:, -1, :], 0.0, atol=1e-6)
    # No-slip walls.
    assert np.abs(out["u"][:, 0]).max() < 1e-10
    assert np.abs(out["w"][:, -1]).max() < 1e-10
    # Incompressibility in the interior (FD estimate).
    u, w = out["u"][-1], out["w"][-1]
    dx, dz = float(out["dx"]), float(out["dz"])
    div = ((np.roll(u, -1, 1) - np.roll(u, 1, 1)) / (2 * dx)
           + np.gradient(w, dz, axis=0))
    scale = max(np.abs(u).max(), np.abs(w).max(), 1e-8) / dz
    assert np.abs(div[2:-2]).max() < 0.05 * scale


def test_dataset_shapes_and_normalization(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=8, nz=16, nx=16, n_samp_pts_per_crop=64,
        downsamp_t=2, downsamp_xz=4)
    item = ds[0]
    assert item["lres"].shape == (4, 4, 4, 4)
    assert item["point_coord"].shape == (64, 3)
    assert item["point_value"].shape == (64, 4)
    assert item["point_coord"].min() >= 0 and item["point_coord"].max() <= 1
    assert len(ds) == (24 - 8 + 1) * (32 - 16 + 1) * (32 - 16 + 1)

    batch = ds.sample_batch(np.random.RandomState(0), 3)
    assert batch["lres"].shape == (3, 4, 4, 4, 4)
    assert batch["point_value"].shape == (3, 64, 4)


def test_point_values_match_grid_interpolation(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=8, nz=16, nx=16, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xz=4, normalize_output=False)
    rng = np.random.RandomState(1)
    item = ds.sample_crop(2, 3, 4, rng)
    # Points at crop corners must equal raw data values.
    hres = ds.data[2:10, 3:19, 4:20]
    ds2 = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=8, nz=16, nx=16, n_samp_pts_per_crop=1,
        downsamp_t=2, downsamp_xz=4, normalize_output=False)
    # Manual check with our own trilinear at a handful of points.
    from scipy.interpolate import RegularGridInterpolator
    axes = (np.linspace(0, 1, 8), np.linspace(0, 1, 16),
            np.linspace(0, 1, 16))
    want = RegularGridInterpolator(axes, hres)(item["point_coord"])
    np.testing.assert_allclose(item["point_value"], want, rtol=1e-5,
                               atol=1e-6)


def test_lres_filters_run(tg_npz):
    import os
    for filt in ("gaussian", "uniform", "median", "maximum"):
        ds = RB2DataLoader(
            data_folder=os.path.dirname(tg_npz),
            data_filename=os.path.basename(tg_npz),
            nt=4, nz=8, nx=8, n_samp_pts_per_crop=8,
            downsamp_t=2, downsamp_xz=2, lres_filter=filt)
        item = ds[0]
        assert np.all(np.isfinite(item["lres"]))


def test_nearest_interp_and_velonly(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=4, nz=8, nx=8, n_samp_pts_per_crop=8,
        downsamp_t=2, downsamp_xz=2, lres_interp="nearest", velonly=True)
    item = ds[0]
    assert item["point_value"].shape == (8, 2)


def test_full_lres_sequence(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=8, nz=16, nx=16, downsamp_t=2, downsamp_xz=4)
    seq = ds.full_lres_sequence(t0=0, nt=16)
    assert seq.shape == (8, 8, 8, 4)
    # Dataset-level lres shape unchanged afterwards.
    assert ds.lres_shape == (4, 4, 4)


def test_coord_extents(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=8, nz=16, nx=16, downsamp_t=2, downsamp_xz=4)
    et, ez, ex = ds.coord_extents
    assert et == pytest.approx(7 * 0.05)
    assert ez == pytest.approx(15 * 2 * np.pi / 32)


def test_vectorized_batch_matches_per_item_oracle(tg_npz):
    """sample_batch's vectorized pipeline == per-item scipy path, for
    every filter and both interpolation modes."""
    import os
    rng = np.random.RandomState(13)
    for filt in ("none", "gaussian", "uniform", "median", "maximum"):
        for interp in ("linear", "nearest"):
            ds = RB2DataLoader(
                data_folder=os.path.dirname(tg_npz),
                data_filename=os.path.basename(tg_npz),
                nt=8, nz=16, nx=16, n_samp_pts_per_crop=24,
                downsamp_t=2, downsamp_xz=4,
                lres_filter=filt, lres_interp=interp)
            o = ds._origins
            b = 3
            t0 = rng.randint(o[0], size=b)
            z0 = rng.randint(o[1], size=b)
            x0 = rng.randint(o[2], size=b)
            pts = rng.rand(b, 24, 3).astype(np.float32)
            got = ds.batch_from_origins(t0, z0, x0, pts)
            for i in range(b):
                want = ds.sample_crop(int(t0[i]), int(z0[i]), int(x0[i]),
                                      rng, pts=pts[i])
                np.testing.assert_allclose(
                    got["lres"][i], want["lres"], rtol=1e-5, atol=1e-5,
                    err_msg=f"lres {filt}/{interp}")
                np.testing.assert_allclose(
                    got["point_value"][i], want["point_value"],
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"values {filt}/{interp}")


def test_vectorized_batch_velonly_and_hres(tg_npz):
    import os
    ds = RB2DataLoader(
        data_folder=os.path.dirname(tg_npz),
        data_filename=os.path.basename(tg_npz),
        nt=4, nz=8, nx=8, n_samp_pts_per_crop=8,
        downsamp_t=2, downsamp_xz=2, velonly=True, return_hres=True)
    batch = ds.sample_batch(np.random.RandomState(0), 2)
    assert batch["point_value"].shape == (2, 8, 2)
    assert batch["hres"].shape == (2, 4, 8, 8, 4)


def test_multifile_dataset_concat_and_no_straddle(tmp_path):
    """Comma-separated data files concatenate along T; crop origins
    never straddle a file boundary (our multi-simulation data-axis
    extension of the reference's single-file RB2DataLoader)."""
    from space_time_pde_tpu.data import save_npz, taylor_green_fields

    fa = taylor_green_fields(nt=10, nz=16, nx=16, dt=0.05)
    fb = taylor_green_fields(nt=12, nz=16, nx=16, dt=0.05, viscosity=2e-2)
    save_npz(str(tmp_path / "a.npz"), fa)
    save_npz(str(tmp_path / "b.npz"), fb)

    nt = 6
    ds = RB2DataLoader(
        data_folder=str(tmp_path), data_filename="a.npz, b.npz",
        nt=nt, nz=16, nx=16, n_samp_pts_per_crop=8,
        downsamp_t=2, downsamp_xz=4)
    assert ds.data.shape[0] == 22
    # valid t0: [0..4] (file a) and [10..16] (file b) — nothing in
    # [5..9], which would straddle the boundary at frame 10.
    expect = np.concatenate([np.arange(0, 5), np.arange(10, 17)])
    np.testing.assert_array_equal(ds.valid_t0, expect)
    assert ds._origins[0] == len(expect)

    # Every sampled batch origin is a valid (non-straddling) t0.
    rng = np.random.RandomState(0)
    t0 = ds.valid_t0[rng.randint(ds._origins[0], size=256)]
    assert np.isin(t0, expect).all()

    # get_item at a t0-index in the second file reads file-b data.
    item = ds.get_item((5 + 2) * ds._origins[1] * ds._origins[2])
    assert item["lres"].shape == (3, 4, 4, 4)

    # DeviceSampler draw maps through valid_t0 too.
    from space_time_pde_tpu.data.device_pipeline import DeviceSampler
    samp = DeviceSampler(ds)
    origins, pts = samp.draw(np.random.RandomState(1), 64)
    assert np.isin(origins[:, 0], expect).all()

    # Single-file behavior is unchanged.
    ds1 = RB2DataLoader(
        data_folder=str(tmp_path), data_filename="a.npz",
        nt=nt, nz=16, nx=16, n_samp_pts_per_crop=8,
        downsamp_t=2, downsamp_xz=4)
    np.testing.assert_array_equal(ds1.valid_t0, np.arange(5))
