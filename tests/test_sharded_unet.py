"""Sharded UNet3d encoder: n=4-shard execution == n=1 (unsharded), and
end-to-end with the sharded query (full grid-sharded pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np
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


def test_full_grid_sharded_pipeline():
    """Sharded encode -> latent shard -> halo'd sharded query, vs the
    unsharded encode + plain query: the complete config-#5 data path."""
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
    iparams = imnet.init(key, jnp.ones((1, 3 + C)))
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
