"""UNet4d encoder running on an x-sharded 4-D grid (halo convs).

Closes the last replicated-encoder gap in the config-#5 scale-out
story: 4-D (t, z, y, x) context grids larger than one chip's HBM.
The reference has no 4-D stack at all (SURVEY.md §1 — it is strictly
2-D space + time); this is the sharded counterpart of our
``models.unet4d.UNet4d`` extension.

The lift over the 3-D machinery is small because the 4-D convolution
is FACTORIZED (models/unet4d.py::Conv4d): a 3-D conv over (z, y, x)
with time folded into the batch, then a 1-D conv over t with space
folded into the batch. Only the spatial 3-D conv sees the sharded x
axis — and :class:`~space_time_pde_tpu.parallel.halo_conv.HaloConv3d`
is shape-generic over its two SAME-padded leading spatial dims, so it
IS the sharded spatial factor (with (z, y) in the SAME slots). The
temporal factor folds x into the batch and is purely shard-local, as
are the 1x1 convs, the nearest-neighbor x2 upsampling (per-shard
repeat of a block partition equals repeat of the global array), and
:class:`ShardedGroupNorm` (rank-agnostic psum'd statistics).

Same parameter pytree as ``UNet4d`` (HaloConv3d exposes nn.Conv-shaped
params at its own scope; the factor names ``spatial``/``temporal``
match Conv4d's), so one checkpoint runs in either layout — the same
interchange property ShardedUNet3d has with UNet3d (tested in
tests/test_sharded_unet4d.py).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from space_time_pde_tpu.models.nonlinearities import get_activation
from space_time_pde_tpu.models.unet4d import Conv4d, _num_groups
from space_time_pde_tpu.parallel.halo_conv import (
    HaloConv3d, ShardedGroupNorm,
)

__all__ = ["HaloConv4d", "ShardedResBlock4D", "ShardedUNet4d",
           "init_sharded_unet4d_params"]


class HaloConv4d(nn.Module):
    """Factorized 4-D conv on an x-sharded block [B, T, Z, Y, X_loc, C].

    Spatial factor: :class:`HaloConv3d` over (z, y, x_loc) with time
    folded into the batch — the halo exchange on x is the ONLY
    cross-shard communication. Temporal factor: 1-D SAME conv over t
    with space folded into the batch (shard-local). Parameter subtree
    identical to ``models.unet4d.Conv4d`` (``spatial`` kernel without
    bias, ``temporal`` kernel + bias).
    """

    features: int
    kernel_spatial: int = 3
    kernel_time: int = 3
    strides: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True
    axis_name: str = "space"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, z, y, xx, c = x.shape
        st, sz, sy, sx = self.strides
        ks = self.kernel_spatial
        h = x.reshape(b * t, z, y, xx, c)
        h = HaloConv3d(self.features, (ks, ks, ks), strides=(sz, sy, sx),
                       axis_name=self.axis_name, use_bias=False,
                       dtype=self.dtype, name="spatial")(h)
        z2, y2, x2 = h.shape[1:4]
        h = h.reshape(b, t, z2, y2, x2, self.features)
        h = jnp.moveaxis(h, 1, 4)                    # [B, Z, Y, X, T, C]
        h = h.reshape(b * z2 * y2 * x2, t, self.features)
        h = nn.Conv(self.features, (self.kernel_time,), strides=(st,),
                    padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype, name="temporal")(h)
        t2 = h.shape[1]
        h = h.reshape(b, z2, y2, x2, t2, self.features)
        return jnp.moveaxis(h, 4, 1)                 # [B, T, Z, Y, X, C]


class ShardedResBlock4D(nn.Module):
    """Bottleneck residual block, sharded twin of ``ResBlock4D``."""

    neck_channels: int
    out_channels: int
    axis_name: str = "space"
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation, self.negative_slope)
        # 1x1x1x1 convs are pointwise (shard-local): the plain
        # factorized Conv4d applies unchanged on the shard.
        h = Conv4d(self.neck_channels, 1, 1, dtype=self.dtype,
                   name="conv1")(x)
        h = act(ShardedGroupNorm(_num_groups(self.neck_channels),
                                 self.axis_name, name="norm1")(h))
        h = HaloConv4d(self.neck_channels, 3, 3,
                       axis_name=self.axis_name, dtype=self.dtype,
                       name="conv2")(h)
        h = act(ShardedGroupNorm(_num_groups(self.neck_channels),
                                 self.axis_name, name="norm2")(h))
        h = Conv4d(self.out_channels, 1, 1, dtype=self.dtype,
                   name="conv3")(h)
        h = ShardedGroupNorm(_num_groups(self.out_channels),
                             self.axis_name, name="norm3")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv4d(self.out_channels, 1, 1, use_bias=False,
                       dtype=self.dtype, name="proj")(x)
        return act(h + x)


class ShardedUNet4d(nn.Module):
    """x-sharded UNet4d: [B, T, Z, Y, X_loc, Cin] -> same-res latent
    shard. ``igres`` is the GLOBAL (T, Z, Y, X) resolution; the local
    x size must stay even through every level
    (X / n_shards % 2**levels == 0). Must run inside ``shard_map``
    with the x axis sharded over ``axis_name``.
    """

    in_features: int = 4
    out_features: int = 32
    igres: Sequence[int] = (4, 8, 8, 8)
    nf: int = 16
    mf: int = 512
    axis_name: str = "space"
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"

    @property
    def levels(self) -> int:
        return int(math.floor(math.log2(min(self.igres))))

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train                      # GroupNorm only (matches UNet4d)
        lv = self.levels
        act = get_activation(self.activation, self.negative_slope)
        # Same input validation as UNet4d.__call__ (models/unet4d.py),
        # adapted to the x-sharded layout: the T/Z/Y axes must match the
        # global igres, the local x shard must tile the global X, and
        # every axis (incl. the local x) must stay even through all
        # levels — otherwise the mismatch surfaces later as an opaque
        # concat/shape error inside shard_map.
        if tuple(x.shape[1:4]) != tuple(self.igres[:3]):
            raise ValueError(
                f"ShardedUNet4d built for global igres="
                f"{tuple(self.igres)}, got input T/Z/Y {x.shape[1:4]}")
        if self.igres[3] % x.shape[4] != 0:
            raise ValueError(
                f"local x {x.shape[4]} does not tile global X "
                f"{self.igres[3]}")
        for r in self.igres[:3]:
            if r % (2 ** lv) != 0:
                raise ValueError(
                    f"igres {tuple(self.igres)} not divisible by 2^{lv}")
        if x.shape[4] % (2 ** lv) != 0:
            raise ValueError(
                f"local x {x.shape[4]} not divisible by 2^{lv}")
        x = x.astype(self.dtype)
        block = lambda neck, ch, name: ShardedResBlock4D(
            neck, ch, self.axis_name, self.negative_slope, self.dtype,
            self.activation, name=name)

        h = act(HaloConv4d(self.nf, 3, 3, axis_name=self.axis_name,
                           dtype=self.dtype, name="conv_in")(x))

        skips = []
        ch = self.nf
        for i in range(lv):
            h = block(max(ch // 2, 1), ch, f"down_res{i}")(h)
            skips.append(h)
            ch = min(ch * 2, self.mf)
            h = act(HaloConv4d(ch, 3, 3, strides=(2, 2, 2, 2),
                               axis_name=self.axis_name,
                               dtype=self.dtype, name=f"down{i}")(h))

        h = block(max(ch // 2, 1), ch, "bottleneck")(h)

        for i in reversed(range(lv)):
            skip = skips[i]
            ch = skip.shape[-1]
            # Nearest-neighbor x2: per-shard repeat of a block-
            # partitioned axis equals repeat of the global array
            # (shard-local; matches UNet4d's upsampling exactly).
            for ax in (1, 2, 3, 4):
                h = jnp.repeat(h, 2, axis=ax)
            h = act(HaloConv4d(ch, 3, 3, axis_name=self.axis_name,
                               dtype=self.dtype, name=f"up{i}")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(max(ch // 2, 1), ch, f"up_res{i}")(h)

        out = Conv4d(self.out_features, 1, 1, dtype=self.dtype,
                     name="conv_out")(h)
        return out.astype(jnp.float32)


def init_sharded_unet4d_params(key, unet: ShardedUNet4d, sample_lres):
    """Init params outside any mesh context (1-device shard_map)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), (unet.axis_name,))
    spec = P(None, None, None, None, unet.axis_name, None)
    return jax.jit(jax.shard_map(
        lambda x: unet.init(key, x), mesh=mesh1,
        in_specs=(spec,), out_specs=P(),
        check_vma=False))(sample_lres)
