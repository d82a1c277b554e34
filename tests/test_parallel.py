"""M8 DP tests on the virtual 8-device CPU mesh: the shard_map step
must agree with the single-device step (same grads via psum)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from space_time_pde_tpu.data import RB2DataLoader, save_npz, taylor_green_fields
from space_time_pde_tpu.parallel import (
    make_dp_train_step, replicate_state, shard_batch,
)
from space_time_pde_tpu.train import (
    build_models, init_state, make_loss_fn, make_train_step,
)
from space_time_pde_tpu.train.trainer import make_optimizer
from space_time_pde_tpu.utils.config import Config


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    save_npz(str(d / "tg.npz"),
             taylor_green_fields(nt=16, nz=16, nx=16, dt=0.05))
    cfg = Config()
    cfg.data.data_folder = str(d)
    cfg.data.nt, cfg.data.nz, cfg.data.nx = 8, 16, 16
    cfg.data.downsamp_t, cfg.data.downsamp_xz = 2, 4
    cfg.data.n_samp_pts_per_crop = 32
    cfg.model.lat_dims = 8
    cfg.model.unet_nf = 8
    cfg.model.imnet_nf = 2
    cfg.train.reg_loss_type = "l2"
    ds = RB2DataLoader(
        data_folder=str(d), data_filename="tg.npz",
        nt=8, nz=16, nx=16, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xz=4)
    unet, imnet = build_models(cfg, ds.lres_shape)
    return cfg, ds, unet, imnet


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dp_step_matches_single_device(setup):
    """DP(8) == single-device step.

    Tolerances reflect f32 conv-gradient reduction-order noise between
    batch-8 and batch-1 execution (measured ~1e-3 relative on this CPU
    backend); a real DP bug — missing/incorrect pmean, unscaled grads —
    shows up at order-of-magnitude scale and still fails these bounds.
    SGD (update = lr * grad) avoids Adam's m/sqrt(v) amplification of
    that noise on near-zero gradients.
    """
    import optax

    cfg, ds, unet, imnet = setup
    tx = optax.sgd(1e-2)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)

    batch = {k: jnp.asarray(v) for k, v in
             ds.sample_batch(np.random.RandomState(0), 8).items()}

    single = make_train_step(loss_fn, tx, jit=True)
    s1, m1 = single(
        init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx), batch)
    state = init_state(jax.random.PRNGKey(0), cfg, unet, imnet, tx)

    dp_step, mesh = make_dp_train_step(loss_fn, tx, 8)
    s8, m8 = dp_step(replicate_state(state, mesh),
                     shard_batch(batch, mesh))

    # pmean of shard losses == global loss for L2 (equal shard sizes).
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m8["grad_norm"]),
                               float(m1["grad_norm"]), rtol=3e-2)
    # Param update = lr*grad; bound |dp - single| by noise * lr scale.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4),
        s8.params, s1.params)


@pytest.mark.slow
def test_dp_step_with_pde_loss_runs(setup):
    from space_time_pde_tpu.physics import get_rb2_pde_layer

    cfg, ds, unet, imnet = setup
    cfg2 = Config.from_dict(cfg.to_dict())
    cfg2.train.alpha_pde = 0.05
    et, ez, ex = ds.coord_extents
    pde = get_rb2_pde_layer(ds.channel_mean, ds.channel_std, et, ez, ex,
                            rayleigh=1e4)
    tx = make_optimizer(cfg2)
    state = init_state(jax.random.PRNGKey(1), cfg2, unet, imnet, tx)
    loss_fn = make_loss_fn(cfg2, unet, imnet, pde)
    dp_step, mesh = make_dp_train_step(loss_fn, tx, 8)
    state = replicate_state(state, mesh)
    batch = shard_batch(
        {k: jnp.asarray(v) for k, v in
         ds.sample_batch(np.random.RandomState(1), 8).items()}, mesh)
    state, metrics = dp_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["pde_loss"]))
    state, _ = dp_step(state, batch)  # reuses compiled graph


@pytest.mark.slow
def test_dp_multi_step_matches_sequential(setup):
    """[slow: pde-on variant; dp core equivalence stays default via
    test_dp_step_matches_single_device]
    [slow, opt-in: pytest -m slow — compiles a second scan-of-steps
    shard_map graph, ~35 s; compositional coverage: multi-step ==
    sequential is default-tested in test_trainer.py and dp == single
    device in test_dp_step_matches_single_device]
    make_dp_multi_step(G) == G sequential make_dp_train_step calls."""
    import optax

    from space_time_pde_tpu.parallel import make_dp_multi_step

    cfg, ds, unet, imnet = setup
    tx = optax.sgd(1e-2)
    loss_fn = make_loss_fn(cfg, unet, imnet, pde_layer=None)
    rng = np.random.RandomState(9)
    batches = [ds.sample_batch(rng, 8) for _ in range(3)]

    step1, mesh = make_dp_train_step(loss_fn, tx, 8)
    seq = replicate_state(
        init_state(jax.random.PRNGKey(4), cfg, unet, imnet, tx), mesh)
    for b in batches:
        seq, m_seq = step1(seq, shard_batch(
            {k: jnp.asarray(v) for k, v in b.items()}, mesh))

    stepG, meshG = make_dp_multi_step(loss_fn, tx, 3, 8)
    stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
               for k in batches[0]}
    chained = replicate_state(
        init_state(jax.random.PRNGKey(4), cfg, unet, imnet, tx), meshG)
    chained, m_chn = stepG(chained, stacked)

    assert int(chained.step) == int(seq.step) == 3
    np.testing.assert_allclose(float(m_chn["loss"]), float(m_seq["loss"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        chained.params, seq.params)
