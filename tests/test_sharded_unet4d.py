"""Sharded UNet4d encoder: 4-shard execution == 1-shard == the plain
UNet4d (same params), completing config #5's 4-D sharded-encoder path."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from space_time_pde_tpu.models.unet4d import UNet4d
from space_time_pde_tpu.parallel.sharded_unet4d import (
    ShardedUNet4d, init_sharded_unet4d_params,
)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


SPEC = P(None, None, None, None, "space", None)


def _apply(m, params, x, n):
    return jax.jit(jax.shard_map(
        lambda xs: m.apply(params, xs), mesh=_mesh(n),
        in_specs=(SPEC,), out_specs=SPEC, check_vma=False))(x)


def test_sharded_unet4d_matches_plain_unet4d():
    """One parameter pytree, three execution layouts: plain UNet4d,
    1-shard ShardedUNet4d, 4-shard ShardedUNet4d — all agree."""
    igres = (4, 4, 8, 16)
    plain = UNet4d(in_features=4, out_features=8, igres=igres, nf=8)
    sharded = ShardedUNet4d(in_features=4, out_features=8, igres=igres,
                            nf=8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *igres, 4).astype(np.float32))

    params = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    sh_params = init_sharded_unet4d_params(
        jax.random.PRNGKey(0), sharded, x)

    # Identical parameter pytrees (the checkpoint-interchange property).
    want_tree = jax.tree.map(lambda a: a.shape, params)
    got_tree = jax.tree.map(lambda a: a.shape, sh_params)
    assert want_tree == got_tree

    want = plain.apply(params, x)
    got1 = _apply(sharded, params, x, 1)
    got4 = _apply(sharded, params, x, 4)
    assert got4.shape == (2, *igres, 8)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(got4), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_dp_sp_4d_sharded_encoder_step():
    """[slow: composition variant — encoder parity stays default via
    test_sharded_unet4d_matches_plain_unet4d; the dp_sp sharded-encoder
    step stays default in 3-D via test_dp_sp_with_sharded_encoder]
    make_dp_sp_train_step with the 4-D sharded encoder on a
    (data=2, space=2) mesh: one full optimizer step runs and the
    gradient psum leaves params replica-identical across the mesh."""
    import optax

    from space_time_pde_tpu.models import ImNet
    from space_time_pde_tpu.parallel.dp_sp import (
        make_dp_sp_batch, make_dp_sp_train_step,
    )
    from space_time_pde_tpu.train.trainer import TrainState
    from space_time_pde_tpu.utils.config import Config

    igres = (4, 4, 4, 8)
    C = 8
    unet = ShardedUNet4d(in_features=4, out_features=C, igres=igres,
                         nf=4, mf=16)
    imnet = ImNet(dim=4, in_features=C, out_features=4, nf=2)
    cfg = Config()
    cfg.train.alpha_pde = 0.0

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(2)
    lres = rng.randn(2, *igres, 4).astype(np.float32)
    batch = {
        "lres": lres,
        "point_coord": rng.rand(2, 32, 4).astype(np.float32),
        "point_value": rng.randn(2, 32, 4).astype(np.float32),
    }
    batch = make_dp_sp_batch(batch, n_space=2, n_nodes_x=igres[-1],
                             m_round=16)

    params = {
        "unet": init_sharded_unet4d_params(
            key, unet, jnp.asarray(lres))["params"],
        "imnet": jax.jit(imnet.init)(key, jnp.ones((1, 4 + C)))["params"],
    }
    tx = optax.sgd(1e-3)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), key=key)

    step, mesh, place = make_dp_sp_train_step(
        cfg, unet, imnet, None, tx, n_data=2, n_space=2,
        sharded_encoder=True)
    state, batch = place(state, batch)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # Params changed and are finite.
    w0 = np.asarray(jax.device_get(
        state.params["imnet"]["fc0"]["kernel"]))
    w1 = np.asarray(jax.device_get(
        state2.params["imnet"]["fc0"]["kernel"]))
    assert np.all(np.isfinite(w1)) and not np.allclose(w0, w1)
