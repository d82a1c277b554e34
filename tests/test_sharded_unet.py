"""Sharded UNet3d encoder: n=4-shard execution == n=1 (unsharded), and
end-to-end with the sharded query (full grid-sharded pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from space_time_pde_tpu.parallel.sharded_unet import ShardedUNet3d


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


SPEC = P(None, None, None, "space", None)


def _apply(m, params, x, n):
    return jax.jit(jax.shard_map(
        lambda xs: m.apply(params, xs), mesh=_mesh(n),
        in_specs=(SPEC,), out_specs=SPEC, check_vma=False))(x)


def test_sharded_unet_matches_unsharded():
    igres = (4, 16, 32)
    m = ShardedUNet3d(in_features=4, out_features=8, igres=igres, nf=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *igres, 4).astype(np.float32))

    params = jax.jit(jax.shard_map(
        lambda xs: m.init(jax.random.PRNGKey(0), xs), mesh=_mesh(1),
        in_specs=(SPEC,), out_specs=P(), check_vma=False))(x)

    want = _apply(m, params, x, 1)
    got = _apply(m, params, x, 4)
    assert got.shape == (2, *igres, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_full_grid_sharded_pipeline():
    """[slow: composition variant — the sharded encode + halo'd query
    pieces stay default via test_dp_sp_with_sharded_encoder and the
    halo-query parity tests] Sharded encode -> latent shard -> halo'd
    sharded query, vs the unsharded encode + plain query: the complete
    config-#5 data path."""
    from space_time_pde_tpu.models import (
        ImNet, query_local_implicit_grid,
    )
    from space_time_pde_tpu.parallel.halo import (
        bin_points_by_shard, sharded_query_local_implicit_grid,
    )

    igres = (4, 8, 16)
    C = 8
    n = 4
    unet = ShardedUNet3d(in_features=4, out_features=C, igres=igres, nf=8)
    imnet = ImNet(dim=3, in_features=C, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, *igres, 4).astype(np.float32))
    pts = rng.rand(64, 3).astype(np.float32)

    uparams = jax.jit(jax.shard_map(
        lambda xs: unet.init(key, xs), mesh=_mesh(1),
        in_specs=(SPEC,), out_specs=P(), check_vma=False))(x)
    iparams = jax.jit(imnet.init)(key, jnp.ones((1, 3 + C)))
    decoder = lambda v: imnet.apply(iparams, v)

    # Reference: unsharded encode (n=1) + plain query.
    latent = _apply(unet, uparams, x, 1)
    want = np.asarray(query_local_implicit_grid(
        decoder, latent, jnp.asarray(pts[None])))[0]

    # Sharded: encode and query without ever materializing the full
    # latent grid on one device.
    binned, mask, inverse = bin_points_by_shard(pts, n, igres[2])

    def pipeline(xs, pts_shard):
        lat_shard = unet.apply(uparams, xs)
        return sharded_query_local_implicit_grid(
            decoder, lat_shard, pts_shard, "space", igres[2])

    out = jax.jit(jax.shard_map(
        pipeline, mesh=_mesh(n),
        in_specs=(SPEC, P("space")),
        out_specs=P("space"), check_vma=False))(
            x, jnp.asarray(binned))
    got = np.asarray(out)[mask][inverse]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dp_sp_with_sharded_encoder():
    """2-D mesh training step with the halo-conv encoder: the latent
    grid is never materialized whole on any device."""
    import optax
    from space_time_pde_tpu.data import RB2DataLoader, save_npz, \
        taylor_green_fields
    from space_time_pde_tpu.parallel.dp_sp import (
        make_dp_sp_batch, make_dp_sp_train_step,
    )
    from space_time_pde_tpu.parallel.sharded_unet import (
        init_sharded_unet_params,
    )
    from space_time_pde_tpu.models import ImNet
    from space_time_pde_tpu.physics import get_rb2_pde_layer
    from space_time_pde_tpu.train.trainer import TrainState
    from space_time_pde_tpu.utils.config import Config
    import tempfile, os

    d = tempfile.mkdtemp()
    save_npz(os.path.join(d, "tg.npz"),
             taylor_green_fields(nt=16, nz=16, nx=32, dt=0.05))
    ds = RB2DataLoader(
        data_folder=d, data_filename="tg.npz",
        nt=8, nz=16, nx=32, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xz=2)       # lres (4, 8, 16); x=16 -> 8/shard

    cfg = Config()
    cfg.train.alpha_pde = 0.05
    unet = ShardedUNet3d(in_features=4, out_features=8,
                         igres=ds.lres_shape, nf=8)
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, *ds.lres_shape, 4))
    params = {
        "unet": init_sharded_unet_params(key, unet, sample)["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"],
    }
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), key=key)
    et, ez, ex = ds.coord_extents
    pde = get_rb2_pde_layer(ds.channel_mean, ds.channel_std, et, ez, ex,
                            rayleigh=1e4)
    step, mesh, place = make_dp_sp_train_step(
        cfg, unet, imnet, pde, tx, n_data=4, n_space=2,
        sharded_encoder=True)
    batch = make_dp_sp_batch(
        ds.sample_batch(np.random.RandomState(0), 4), 2,
        ds.lres_shape[2])
    state, placed = place(state, {k: jnp.asarray(v)
                                  for k, v in batch.items()})
    state, metrics = step(state, placed)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["pde_loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    state, m2 = step(state, placed)
    assert float(m2["loss"]) < float(metrics["loss"]) * 1.5


def test_unet3d_checkpoint_interchangeable_with_sharded():
    """ONE parameter set runs identically through models.UNet3d and
    ShardedUNet3d at any shard count (checkpoint interchangeability —
    a --sharded_encoder checkpoint restores into evaluation.py's plain
    UNet3d and vice versa)."""
    from space_time_pde_tpu.models import UNet3d

    igres = (4, 16, 32)
    plain = UNet3d(in_features=4, out_features=8, igres=igres, nf=8)
    sharded = ShardedUNet3d(in_features=4, out_features=8, igres=igres,
                            nf=8)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, *igres, 4).astype(np.float32))

    params = jax.jit(plain.init)(jax.random.PRNGKey(3), x)
    # Identical parameter pytrees (names AND shapes).
    sh_params = jax.jit(jax.shard_map(
        lambda xs: sharded.init(jax.random.PRNGKey(3), xs), mesh=_mesh(1),
        in_specs=(SPEC,), out_specs=P(), check_vma=False))(x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(sh_params))
    jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape),
                 params, sh_params)

    want = plain.apply(params, x)
    got1 = _apply(sharded, params, x, 1)
    got4 = _apply(sharded, params, x, 4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_sharded_batchnorm_matches_unsharded():
    """[slow: BatchNorm sharded-parity variant; GroupNorm sharded parity
    stays default via test_dp_sp_with_sharded_encoder]
    --norm batch on the sharded encoder: train-mode outputs AND
    updated running stats at any shard count equal plain UNet3d's
    (BatchNorm statistics pmean'd over the space axis; equal shard
    sizes make the mean of shard means the exact global mean)."""
    from space_time_pde_tpu.models import UNet3d

    igres = (4, 16, 32)
    plain = UNet3d(in_features=4, out_features=8, igres=igres, nf=8,
                   norm="batch")
    sharded = ShardedUNet3d(in_features=4, out_features=8, igres=igres,
                            nf=8, norm="batch", bn_axis_name="space")
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, *igres, 4).astype(np.float32))

    variables = jax.jit(plain.init)(jax.random.PRNGKey(3), x)
    sh_vars = jax.jit(jax.shard_map(
        lambda xs: sharded.init(jax.random.PRNGKey(3), xs), mesh=_mesh(1),
        in_specs=(SPEC,), out_specs=P(), check_vma=False))(x)
    # Checkpoint interchangeability incl. the batch_stats collection.
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(sh_vars))

    want, wvars = plain.apply(variables, x, train=True,
                              mutable=["batch_stats"])

    def run(n):
        def f(xs):
            out, uv = sharded.apply(variables, xs, train=True,
                                    mutable=["batch_stats"])
            return out, uv["batch_stats"]
        return jax.jit(jax.shard_map(
            f, mesh=_mesh(n), in_specs=(SPEC,),
            out_specs=(SPEC, P()), check_vma=False))(x)

    for n in (1, 4):
        got, stats = run(n)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
            stats, wvars["batch_stats"])

    # Inference mode (running averages, no cross-shard sync needed).
    ev_want = plain.apply(variables, x)
    ev_got = _apply(sharded, variables, x, 4)
    np.testing.assert_allclose(np.asarray(ev_got), np.asarray(ev_want),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_dp_sp_sharded_encoder_batchnorm():
    """[slow: BatchNorm sharded-encoder step variant; the GroupNorm
    sharded-encoder step stays default]
    2-D-mesh train step with halo-conv encoder in BatchNorm mode:
    running stats thread through TrainState and actually update."""
    import optax
    from space_time_pde_tpu.data import RB2DataLoader, save_npz, \
        taylor_green_fields
    from space_time_pde_tpu.parallel.dp_sp import (
        make_dp_sp_batch, make_dp_sp_train_step,
    )
    from space_time_pde_tpu.parallel.sharded_unet import (
        init_sharded_unet_params,
    )
    from space_time_pde_tpu.models import ImNet
    from space_time_pde_tpu.train.trainer import TrainState
    from space_time_pde_tpu.utils.config import Config
    import tempfile, os

    d = tempfile.mkdtemp()
    save_npz(os.path.join(d, "tg.npz"),
             taylor_green_fields(nt=16, nz=16, nx=32, dt=0.05))
    ds = RB2DataLoader(
        data_folder=d, data_filename="tg.npz",
        nt=8, nz=16, nx=32, n_samp_pts_per_crop=32,
        downsamp_t=2, downsamp_xz=2)

    cfg = Config()
    cfg.train.alpha_pde = 0.0
    unet = ShardedUNet3d(in_features=4, out_features=8,
                         igres=ds.lres_shape, nf=8, norm="batch",
                         bn_axis_name=("data", "space"))
    imnet = ImNet(dim=3, in_features=8, out_features=4, nf=2)
    key = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, *ds.lres_shape, 4))
    uvars = init_sharded_unet_params(key, unet, sample)
    params = {
        "unet": uvars["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.zeros((1, 11)))["params"],
    }
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), key=key,
                       batch_stats=uvars["batch_stats"])
    stats0 = jax.device_get(state.batch_stats)
    step, mesh, place = make_dp_sp_train_step(
        cfg, unet, imnet, None, tx, n_data=4, n_space=2,
        sharded_encoder=True)
    batch = make_dp_sp_batch(
        ds.sample_batch(np.random.RandomState(0), 4), 2,
        ds.lres_shape[2])
    state, placed = place(state, {k: jnp.asarray(v)
                                  for k, v in batch.items()})
    state, metrics = step(state, placed)
    assert np.isfinite(float(metrics["loss"]))
    assert "_batch_stats" not in metrics
    stats1 = jax.device_get(state.batch_stats)
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        stats0, stats1)
    assert max(jax.tree.leaves(changed)) > 0.0
