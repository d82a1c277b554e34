"""M6 trainer tests: end-to-end overfit (BASELINE config #1), PDE-loss
training step, eval metric, checkpoint save/restore roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.data import (
    RB2DataLoader, save_npz, taylor_green_fields,
)
from space_time_pde_tpu.physics import get_rb2_pde_layer
from space_time_pde_tpu.train import (
    build_models, init_state, make_eval_fn, make_loss_fn,
    make_train_step,
)
from space_time_pde_tpu.train.trainer import make_optimizer
from space_time_pde_tpu.utils.config import Config


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    path = d / "tg.npz"
    save_npz(str(path), taylor_green_fields(nt=16, nz=16, nx=16, dt=0.05))

    cfg = Config()
    cfg.data.data_folder = str(d)
    cfg.data.train_data = "tg.npz"
    cfg.data.nt, cfg.data.nz, cfg.data.nx = 8, 16, 16
    cfg.data.downsamp_t, cfg.data.downsamp_xz = 2, 4
    cfg.data.n_samp_pts_per_crop = 128
    cfg.model.lat_dims = 8
    cfg.model.unet_nf = 8
    cfg.model.imnet_nf = 4
    cfg.train.lr = 5e-3
    cfg.train.reg_loss_type = "l2"

    ds = RB2DataLoader(
        data_folder=cfg.data.data_folder, data_filename=cfg.data.train_data,
        nt=cfg.data.nt, nz=cfg.data.nz, nx=cfg.data.nx,
        n_samp_pts_per_crop=cfg.data.n_samp_pts_per_crop,
        downsamp_t=cfg.data.downsamp_t, downsamp_xz=cfg.data.downsamp_xz)
    unet, imnet = build_models(cfg, ds.lres_shape)
    return cfg, ds, unet, imnet


def test_overfit_regression_only(tiny_setup):
    cfg, ds, unet, imnet = tiny_setup
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)
    step = make_train_step(loss_fn, tx)

    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v)
             for k, v in ds.sample_batch(rng, 2).items()}
    first = None
    n_steps = 250
    for i in range(n_steps):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < 0.25 * first, (first, last)
    assert int(state.step) == n_steps


def test_train_step_with_pde_loss(tiny_setup):
    cfg, ds, unet, imnet = tiny_setup
    cfg2 = Config.from_dict(cfg.to_dict())
    cfg2.train.alpha_pde = 0.1
    et, ez, ex = ds.coord_extents
    pde_layer = get_rb2_pde_layer(
        mean=ds.channel_mean, std=ds.channel_std,
        t_crop=et, z_crop=ez, x_crop=ex,
        rayleigh=1e4, prandtl=1.0)
    tx = make_optimizer(cfg2)
    state = init_state(jax.random.PRNGKey(1), cfg2, unet, imnet, tx)
    loss_fn = make_loss_fn(cfg2, unet, imnet, pde_layer)
    step = make_train_step(loss_fn, tx)

    batch = {k: jnp.asarray(v)
             for k, v in ds.sample_batch(np.random.RandomState(1), 2).items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["pde_loss"]))
    assert {"pde/continuity", "pde/temperature", "pde/momentum_x",
            "pde/momentum_z"} <= set(metrics)
    # A second step must reuse the compiled graph without error.
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))


def test_eval_fn_rel_l2(tiny_setup):
    cfg, ds, unet, imnet = tiny_setup
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(2), cfg, unet, imnet, tx)
    eval_fn = make_eval_fn(cfg, unet, imnet)
    batch = {k: jnp.asarray(v)
             for k, v in ds.sample_batch(np.random.RandomState(2), 2).items()}
    m = eval_fn(state.params, batch)
    assert np.isfinite(float(m["rel_l2"]))
    assert m["rel_l2_per_channel"].shape == (4,)

    # Params-aware query hook (the TPU turb3d eval path — the jnp 4-D
    # query segfaults XLA:TPU there; here just verify the hook routes
    # and matches the default jnp path when given the same math).
    from space_time_pde_tpu.models import query_local_implicit_grid
    seen = {}

    def iq(imnet_params, latent, coords):
        seen["called"] = True
        dec = lambda v: imnet.apply({"params": imnet_params}, v)
        return query_local_implicit_grid(dec, latent, coords)

    eval_fn2 = make_eval_fn(cfg, unet, imnet, imnet_query_fn=iq)
    m2 = eval_fn2(state.params, batch)
    assert seen.get("called")
    np.testing.assert_allclose(float(m2["rel_l2"]), float(m["rel_l2"]),
                               rtol=1e-6)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    from space_time_pde_tpu.utils.checkpoint import CheckpointManager

    cfg, ds, unet, imnet = tiny_setup
    tx = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(3), cfg, unet, imnet, tx)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)
    step = make_train_step(loss_fn, tx)
    batch = {k: jnp.asarray(v)
             for k, v in ds.sample_batch(np.random.RandomState(3), 1).items()}
    for _ in range(3):
        state, _ = step(state, batch)

    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    extra = {"config": cfg.to_dict(),
             "channel_mean": np.asarray(ds.channel_mean),
             "channel_std": np.asarray(ds.channel_std)}
    mngr.save(int(state.step), state, extra)
    assert mngr.latest_step() == 3

    template = init_state(jax.random.PRNGKey(4), cfg, unet, imnet, tx)
    restored, extra2 = mngr.restore(template)
    assert int(restored.step) == 3
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=0),
        state.params, restored.params)
    np.testing.assert_allclose(extra2["channel_mean"], ds.channel_mean)

    # Resumed training continues bit-exact vs uninterrupted training.
    s_cont, m_cont = step(state, batch)
    s_res, m_res = step(restored, batch)
    np.testing.assert_allclose(float(m_cont["loss"]), float(m_res["loss"]),
                               rtol=1e-6)
    mngr.close()


@pytest.mark.slow
def test_legacy_checkpoint_opt_state_migration(tiny_setup, tmp_path):
    """[slow: legacy-layout migration; the live checkpoint path stays
    default via test_checkpoint_roundtrip]
    Checkpoints written before the optimizer was wrapped in
    optax.apply_if_finite (a different opt_state pytree) must still
    restore: the inner state is re-wrapped with fresh counters."""
    from space_time_pde_tpu.utils.checkpoint import CheckpointManager

    cfg, ds, unet, imnet = tiny_setup
    tx_new = make_optimizer(cfg)
    state = init_state(jax.random.PRNGKey(5), cfg, unet, imnet, tx_new)
    inner = state.opt_state.inner_state
    legacy_state = state.replace(opt_state=inner)  # pre-wrap layout

    mngr = CheckpointManager(str(tmp_path / "ckpt"), keep=1)
    mngr.save(0, legacy_state, {"config": cfg.to_dict()})

    template = init_state(jax.random.PRNGKey(6), cfg, unet, imnet, tx_new)
    restored, _ = mngr.restore(template)
    assert isinstance(restored.opt_state,
                      type(template.opt_state))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=0),
        restored.opt_state.inner_state, inner)
    # The re-wrapped state steps without error.
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)
    step = make_train_step(loss_fn, tx_new)
    batch = {k: jnp.asarray(v)
             for k, v in ds.sample_batch(np.random.RandomState(5), 1).items()}
    s2, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))
    mngr.close()


def test_multi_step_matches_sequential(tiny_setup):
    import optax
    from space_time_pde_tpu.train.trainer import make_multi_step

    cfg, ds, unet, imnet = tiny_setup
    tx = optax.sgd(1e-3)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)
    rng = np.random.RandomState(7)
    batches = [ds.sample_batch(rng, 1) for _ in range(3)]
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}

    s_seq = init_state(jax.random.PRNGKey(5), cfg, unet, imnet, tx)
    single = make_train_step(loss_fn, tx, jit=False)
    for b in batches:
        s_seq, m_seq = single(s_seq, {k: jnp.asarray(v)
                                      for k, v in b.items()})

    s_multi = init_state(jax.random.PRNGKey(5), cfg, unet, imnet, tx)
    multi = make_multi_step(loss_fn, tx, 3)
    s_multi, m_multi = multi(s_multi, stacked)

    assert int(s_multi.step) == 3
    np.testing.assert_allclose(float(m_multi["loss"]),
                               float(m_seq["loss"]), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s_multi.params, s_seq.params)
