"""Sharded-latent-grid query tests on the 8-device CPU mesh:
halo exchange + per-device bounds must reproduce the unsharded query."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from space_time_pde_tpu.models import ImNet, query_local_implicit_grid
from space_time_pde_tpu.parallel.halo import (
    bin_points_by_shard,
    sharded_query_local_implicit_grid,
)


def _mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


def test_sharded_query_matches_unsharded():
    n_shards = 8
    C = 6
    T, Z, X = 4, 5, 16  # X nodes divisible by 8 -> n_loc = 2
    rng = np.random.RandomState(0)
    latent = jnp.asarray(rng.randn(1, T, Z, X, C).astype(np.float32))
    pts = rng.rand(200, 3).astype(np.float32)

    model = ImNet(dim=3, in_features=C, out_features=4, nf=2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 3 + C)))
    decoder = lambda v: model.apply(params, v)

    want = np.asarray(query_local_implicit_grid(
        decoder, latent, jnp.asarray(pts[None])))[0]        # [200, 4]

    binned, mask, inverse = bin_points_by_shard(pts, n_shards, X)
    mesh = _mesh(n_shards)

    def fn(latent_shard, pts_shard):
        return sharded_query_local_implicit_grid(
            decoder, latent_shard, pts_shard, "space", X)

    out = jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, None, None, "space", None), P("space")),
        out_specs=P("space"),
    ))(latent, jnp.asarray(binned))
    out = np.asarray(out)                                   # [8, M, 4]

    got_valid = out[mask]                                   # concat order
    got = got_valid[inverse]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sharded_query_boundary_points():
    """Points exactly on shard boundaries and the global domain edges."""
    n_shards = 8
    C = 4
    X = 16
    rng = np.random.RandomState(1)
    latent = jnp.asarray(rng.randn(1, 3, 3, X, C).astype(np.float32))
    # x on every shard boundary node + extremes.
    xs = np.concatenate([np.arange(0, X, 2) / (X - 1), [0.0, 1.0]])
    pts = np.stack([np.full_like(xs, 0.4), np.full_like(xs, 0.6), xs],
                   axis=-1).astype(np.float32)

    decoder = lambda v: v[..., 3:7]  # identity on latent part
    want = np.asarray(query_local_implicit_grid(
        decoder, latent, jnp.asarray(pts[None])))[0]

    binned, mask, inverse = bin_points_by_shard(pts, n_shards, X)
    mesh = _mesh(n_shards)
    out = jax.jit(jax.shard_map(
        lambda l, p: sharded_query_local_implicit_grid(
            decoder, l, p, "space", X),
        mesh=mesh,
        in_specs=(P(None, None, None, "space", None), P("space")),
        out_specs=P("space"),
    ))(latent, jnp.asarray(binned))
    got = np.asarray(out)[mask][inverse]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bin_points_by_shard_roundtrip():
    rng = np.random.RandomState(2)
    pts = rng.rand(100, 3).astype(np.float32)
    binned, mask, inverse = bin_points_by_shard(pts, 4, 16)
    assert binned.shape[0] == 4
    assert mask.sum() == 100
    flat = binned[mask][inverse]
    np.testing.assert_array_equal(flat, pts)
