"""On-device batch assembly (data/device_pipeline.py) parity tests:
the fused-into-the-graph pipeline must reproduce the host pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.data import RB2DataLoader, save_npz
from space_time_pde_tpu.data.device_pipeline import DeviceSampler
from space_time_pde_tpu.data.generator import taylor_green_fields


@pytest.fixture(scope="module")
def tg_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    save_npz(str(d / "tg.npz"),
             taylor_green_fields(nt=16, nz=16, nx=32, dt=0.05))

    def make(**kw):
        return RB2DataLoader(
            data_folder=str(d), data_filename="tg.npz",
            nt=8, nz=16, nx=32, n_samp_pts_per_crop=48,
            downsamp_t=2, downsamp_xz=4, **kw)

    return make


def test_device_batch_matches_host(tg_ds):
    for interp in ("linear", "nearest"):
        ds = tg_ds(lres_interp=interp)
        sampler = DeviceSampler(ds)
        rng = np.random.RandomState(3)
        origins, pts = sampler.draw(rng, 4)
        dev = sampler.batch_fn(jnp.asarray(origins), jnp.asarray(pts))
        host = ds.batch_from_origins(origins[:, 0], origins[:, 1],
                                     origins[:, 2], pts)
        for k in ("lres", "point_value"):
            np.testing.assert_allclose(
                np.asarray(dev[k]), host[k], rtol=1e-4, atol=1e-4,
                err_msg=f"{k} ({interp})")
        np.testing.assert_allclose(np.asarray(dev["point_coord"]), pts)


def test_device_sampler_rejects_filtered(tg_ds):
    ds = tg_ds(lres_filter="gaussian")
    assert not DeviceSampler.supported(ds)
    with pytest.raises(ValueError):
        DeviceSampler(ds)


def test_wrapped_loss_matches_host_batch(tg_ds):
    """Train loss via on-device assembly == loss on the host batch."""
    import jax

    from space_time_pde_tpu.train import build_models
    from space_time_pde_tpu.train.trainer import make_loss_fn
    from space_time_pde_tpu.physics import get_rb2_pde_layer
    from space_time_pde_tpu.utils.config import Config

    ds = tg_ds()
    cfg = Config()
    cfg.model.lat_dims = 8
    cfg.model.unet_nf = 8
    cfg.model.imnet_nf = 2
    cfg.train.alpha_pde = 0.1
    unet, imnet = build_models(cfg, ds.lres_shape)
    et, ez, ex = ds.coord_extents
    pde = get_rb2_pde_layer(ds.channel_mean, ds.channel_std, et, ez, ex,
                            rayleigh=1e4)
    key = jax.random.PRNGKey(0)
    params = {
        "unet": jax.jit(unet.init)(key, jnp.zeros((1, *ds.lres_shape, 4)))["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 3 + 8)))["params"],
    }
    loss_fn = make_loss_fn(cfg, unet, imnet, pde)
    sampler = DeviceSampler(ds)
    wrapped = sampler.wrap_loss(loss_fn)

    rng = np.random.RandomState(5)
    origins, pts = sampler.draw(rng, 3)
    host_batch = {k: jnp.asarray(v) for k, v in ds.batch_from_origins(
        origins[:, 0], origins[:, 1], origins[:, 2], pts).items()}
    raw = {"origins": jnp.asarray(origins), "point_coord": jnp.asarray(pts)}

    # jit everything: eager op-by-op CPU execution of the jet graph is
    # ~10x slower than the compiled program (and compiles persist in
    # the suite's compilation cache across runs).
    loss_host, _ = jax.jit(loss_fn)(params, host_batch)
    loss_dev, _ = jax.jit(wrapped)(params, raw)
    np.testing.assert_allclose(float(loss_dev), float(loss_host),
                               rtol=1e-4)

    g_host = jax.jit(jax.grad(lambda p: loss_fn(p, host_batch)[0]))(params)
    g_dev = jax.jit(jax.grad(lambda p: wrapped(p, raw)[0]))(params)
    fh, _ = jax.flatten_util.ravel_pytree(g_host)
    fd, _ = jax.flatten_util.ravel_pytree(g_dev)
    np.testing.assert_allclose(np.asarray(fd), np.asarray(fh),
                               rtol=1e-3, atol=1e-5)
