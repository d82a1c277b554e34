"""UNet3d encoder running on an x-sharded grid (halo convs).

Completes the config-#5 scale-out story: with the encoder sharded, the
ENTIRE pipeline (encode -> latent grid -> query) runs on grids larger
than one chip's HBM — the latent shard feeds
``parallel.halo.sharded_query_local_implicit_grid`` directly with no
re-sharding.

Same topology AND the same parameter pytree as ``models.UNet3d``
(bottleneck ResBlocks, strided downsampling doubling filters,
transposed-conv upsampling, skip concat, same-resolution latent head),
built from :mod:`parallel.halo_conv` pieces. The k=2/s=2 transposed
convs are non-overlapping scatters — purely shard-local along x — and
HaloConv3d exposes ``nn.Conv``-shaped params at its own scope, so a
checkpoint trained with either module restores into the other
unchanged (tested: same params, UNet3d vs 1-shard vs 4-shard execution
agree). Must run inside ``shard_map`` with the x axis sharded.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from space_time_pde_tpu.models.nonlinearities import get_activation
from space_time_pde_tpu.parallel.halo_conv import (
    HaloConv3d, ShardedGroupNorm,
)

__all__ = ["ShardedUNet3d", "ShardedResBlock3D",
           "init_sharded_unet_params"]


def _num_groups(ch: int) -> int:
    for g in (8, 4, 2, 1):
        if ch % g == 0:
            return g
    return 1


def _make_sharded_norm(norm: str, ch: int, name: str, train: bool,
                       axis_name: str, bn_axis_name) -> nn.Module:
    """Norm factory mirroring ``models.unet3d.make_norm`` on shards.

    ``group``: :class:`ShardedGroupNorm` (per-(sample, group) stats
    psum'd over the space axis — shard-exact, functional).
    ``batch``: flax ``nn.BatchNorm`` whose batch statistics are pmean'd
    over ``bn_axis_name`` — for the SHARDED encoder this must include
    the space axis (each shard sees only X/n of the spatial positions;
    equal shard sizes make the pmean of local means the exact global
    mean) and the data axis under data parallelism. Same momentum/eps
    as the unsharded mode and the same param/batch_stats tree names, so
    checkpoints remain interchangeable between layouts.
    """
    if norm == "batch":
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.9, epsilon=1e-5,
                            axis_name=bn_axis_name, name=name)
    if norm == "group":
        return ShardedGroupNorm(_num_groups(ch), axis_name, name=name)
    raise ValueError(f"unknown norm {norm!r}; available: group, batch")


class ShardedResBlock3D(nn.Module):
    neck_channels: int
    out_channels: int
    axis_name: str = "space"
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"
    norm: str = "group"
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation, self.negative_slope)
        gn = lambda ch, name: _make_sharded_norm(
            self.norm, ch, name, train, self.axis_name,
            self.bn_axis_name)
        h = nn.Conv(self.neck_channels, (1, 1, 1), dtype=self.dtype,
                    name="conv1")(x)
        h = act(gn(self.neck_channels, "norm1")(h))
        h = HaloConv3d(self.neck_channels, (3, 3, 3),
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="conv2")(h)
        h = act(gn(self.neck_channels, "norm2")(h))
        h = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                    name="conv3")(h)
        h = gn(self.out_channels, "norm3")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name="proj")(x)
        return act(h + x)


class ShardedUNet3d(nn.Module):
    """x-sharded UNet3d: [B, T, Z, X_loc, Cin] -> same-res latent shard.

    ``igres`` is the GLOBAL (T, Z, X) resolution; depth derives from it
    like models.UNet3d. The local x size must stay even through every
    level: X / n_shards % 2**levels == 0.
    """

    in_features: int = 4
    out_features: int = 32
    igres: Sequence[int] = (4, 16, 16)
    nf: int = 16
    mf: int = 512
    axis_name: str = "space"
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"
    norm: str = "group"
    bn_axis_name: Any = None

    @property
    def levels(self) -> int:
        return int(math.floor(math.log2(min(self.igres))))

    @nn.compact
    def __call__(self, x, train: bool = False):
        lv = self.levels
        act = get_activation(self.activation, self.negative_slope)
        if x.shape[3] % (2 ** lv) != 0:
            raise ValueError(
                f"local x {x.shape[3]} not divisible by 2^{lv}")
        x = x.astype(self.dtype)
        block = lambda neck, ch, name: ShardedResBlock3D(
            neck, ch, self.axis_name, self.negative_slope, self.dtype,
            self.activation, self.norm, self.bn_axis_name, name=name)

        h = act(HaloConv3d(self.nf, (3, 3, 3), axis_name=self.axis_name,
                           dtype=self.dtype, name="conv_in")(x))
        skips = []
        ch = self.nf
        for i in range(lv):
            h = block(max(ch // 2, 1), ch, f"down_res{i}")(h, train)
            skips.append(h)
            ch = min(ch * 2, self.mf)
            h = act(HaloConv3d(ch, (3, 3, 3), strides=(2, 2, 2),
                               axis_name=self.axis_name, dtype=self.dtype,
                               name=f"down{i}")(h))

        h = block(max(ch // 2, 1), ch, "bottleneck")(h, train)

        for i in reversed(range(lv)):
            skip = skips[i]
            ch = skip.shape[-1]
            # Transposed conv k=2 s=2: every output voxel receives
            # exactly ONE input contribution (non-overlapping scatter),
            # so it is purely shard-LOCAL along x — no halo needed, and
            # parameters/math are identical to models.UNet3d's up{i}.
            h = act(nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2),
                                     dtype=self.dtype, name=f"up{i}")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(max(ch // 2, 1), ch, f"up_res{i}")(h, train)

        out = nn.Conv(self.out_features, (1, 1, 1), dtype=self.dtype,
                      name="conv_out")(h)
        return out.astype(jnp.float32)


def init_sharded_unet_params(key, unet: ShardedUNet3d, sample_lres):
    """Init params for a ShardedUNet3d outside any mesh context.

    The module contains ppermute halos, so init must run inside a
    shard_map; a 1-device mesh reproduces the unsharded computation and
    yields the same parameter shapes as any shard count.
    """
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), (unet.axis_name,))
    spec = P(None, None, None, unet.axis_name, None)
    return jax.jit(jax.shard_map(
        lambda x: unet.init(key, x), mesh=mesh1,
        in_specs=(spec,), out_specs=P(),
        check_vma=False))(sample_lres)
