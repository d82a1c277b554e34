"""Halo-conv building blocks: sharded execution == unsharded SAME conv."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from space_time_pde_tpu.parallel.halo_conv import (
    HaloConv3d, ShardedGroupNorm, halo_exchange_x,
)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


def _run_sharded(module, params, x, n):
    """Apply module inside shard_map, x sharded on its x axis (-2)."""
    mesh = _mesh(n)
    spec = P(*([None] * 3), "space", None)

    def fn(xs):
        return module.apply(params, xs)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_vma=False))(x)


def test_halo_exchange_zero_at_edges():
    mesh = _mesh(4)
    x = jnp.arange(4 * 8, dtype=jnp.float32).reshape(1, 1, 1, 8, 4)

    def fn(xs):
        return halo_exchange_x(xs, "space", 1, 1)

    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, None, "space", None),),
        out_specs=P(None, None, None, "space", None),
        check_vma=False))(x)
    out = np.asarray(out).reshape(4, 4, 4)  # [shard, xloc+2, C]
    xs = np.asarray(x).reshape(8, 4)
    # Shard 0: left halo zero, then rows 0,1, then row 2 (from shard 1).
    np.testing.assert_array_equal(out[0, 0], 0.0)
    np.testing.assert_array_equal(out[0, 1:3], xs[0:2])
    np.testing.assert_array_equal(out[0, 3], xs[2])
    # Last shard: right halo zero.
    np.testing.assert_array_equal(out[3, -1], 0.0)
    np.testing.assert_array_equal(out[3, 0], xs[5])


@pytest.mark.parametrize("stride", [1, 2])
def test_halo_conv_matches_unsharded_same_conv(stride):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 4, 16, 3).astype(np.float32))

    m = HaloConv3d(features=5, kernel_size=(3, 3, 3),
                   strides=(1, 1, stride), axis_name="space")
    # Init under a 1-shard mesh (halo == SAME padding there).
    params = jax.eval_shape(lambda: None) and None
    mesh1 = _mesh(1)

    def init_fn(xs):
        return m.init(jax.random.PRNGKey(0), xs)

    params = jax.jit(jax.shard_map(
        init_fn, mesh=mesh1,
        in_specs=(P(None, None, None, "space", None),),
        out_specs=P(),
        check_vma=False))(x)

    want = _run_sharded(m, params, x, 1)
    got = _run_sharded(m, params, x, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # And the n=1 path must equal a plain flax SAME conv.
    # HaloConv3d exposes nn.Conv-shaped params at its own scope
    # (checkpoint interchangeability with plain convs).
    ref = nn.Conv(5, (3, 3, 3), strides=(1, 1, stride),
                  padding="SAME").apply(
        {"params": {"kernel": params["params"]["kernel"],
                    "bias": params["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(want), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_groupnorm_matches_flax():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 4, 16, 8).astype(np.float32))
    m = ShardedGroupNorm(num_groups=4, axis_name="space")
    mesh1 = _mesh(1)

    def init_fn(xs):
        return m.init(jax.random.PRNGKey(0), xs)

    params = jax.jit(jax.shard_map(
        init_fn, mesh=mesh1,
        in_specs=(P(None, None, None, "space", None),),
        out_specs=P(), check_vma=False))(x)

    got = _run_sharded(m, params, x, 4)
    ref = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(
        {"params": {"scale": params["params"]["scale"],
                    "bias": params["params"]["bias"]}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
