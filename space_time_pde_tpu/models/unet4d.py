"""UNet4D — 4-D (t, z, y, x) encoder for 3-D turbulence space-time SR.

The reference is strictly 3-D (2-D space + time); BASELINE.json config
#5 targets "3D turbulence (4D space-time context grid)". XLA/TPU
convolutions support at most 3 spatial dimensions, so 4-D convs are
FACTORIZED (the standard (2+1)D trick lifted one rank): a 3-D conv over
(z, y, x) with time folded into the batch, followed by a 1-D conv over
t with space folded into the batch. This keeps every matmul on the MXU
with native conv layouts and costs k_s^3 + k_t instead of k^4 weights
per channel pair.

Everything downstream is already N-d generic: the grid-interpolation
core, the local-implicit-grid query (2^4 = 16 corners), the fused
Pallas kernel (n_corners is a parameter), and the PDE layer (declare
``in_vars="t, z, y, x"``).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn

from space_time_pde_tpu.models.nonlinearities import get_activation
import jax
import jax.numpy as jnp

__all__ = ["UNet4d", "Conv4d", "ResBlock4D"]


def _num_groups(ch: int) -> int:
    for g in (8, 4, 2, 1):
        if ch % g == 0:
            return g
    return 1


class Conv4d(nn.Module):
    """Factorized 4-D convolution: 3-D spatial then 1-D temporal.

    Input [B, T, Z, Y, X, C]. ``strides`` applies per (t, z, y, x).
    """

    features: int
    kernel_spatial: int = 3
    kernel_time: int = 3
    strides: Sequence[int] = (1, 1, 1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, z, y, xx, c = x.shape
        st, sz, sy, sx = self.strides
        ks = self.kernel_spatial
        # Spatial 3-D conv, time folded into batch.
        h = x.reshape(b * t, z, y, xx, c)
        h = nn.Conv(self.features, (ks, ks, ks), strides=(sz, sy, sx),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="spatial")(h)
        z2, y2, x2 = h.shape[1:4]
        h = h.reshape(b, t, z2, y2, x2, self.features)
        # Temporal 1-D conv, space folded into batch.
        h = jnp.moveaxis(h, 1, 4)                    # [B, Z, Y, X, T, C]
        h = h.reshape(b * z2 * y2 * x2, t, self.features)
        h = nn.Conv(self.features, (self.kernel_time,), strides=(st,),
                    padding="SAME", use_bias=self.use_bias,
                    dtype=self.dtype, name="temporal")(h)
        t2 = h.shape[1]
        h = h.reshape(b, z2, y2, x2, t2, self.features)
        return jnp.moveaxis(h, 4, 1)                 # [B, T, Z, Y, X, C]


class ResBlock4D(nn.Module):
    """Bottleneck residual block with factorized 4-D convs."""

    neck_channels: int
    out_channels: int
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation, self.negative_slope)
        h = Conv4d(self.neck_channels, 1, 1, dtype=self.dtype,
                   name="conv1")(x)
        h = act(nn.GroupNorm(_num_groups(self.neck_channels),
                             name="norm1")(h))
        h = Conv4d(self.neck_channels, 3, 3, dtype=self.dtype,
                   name="conv2")(h)
        h = act(nn.GroupNorm(_num_groups(self.neck_channels),
                             name="norm2")(h))
        h = Conv4d(self.out_channels, 1, 1, dtype=self.dtype,
                   name="conv3")(h)
        h = nn.GroupNorm(_num_groups(self.out_channels), name="norm3")(h)
        if x.shape[-1] != self.out_channels:
            x = Conv4d(self.out_channels, 1, 1, use_bias=False,
                       dtype=self.dtype, name="proj")(x)
        return act(h + x)


class UNet4d(nn.Module):
    """4-D U-Net encoder: [B, T, Z, Y, X, Cin] -> same-res latent grid.

    Same topology as UNet3d (strided down, transposed up, skip concat,
    filter doubling capped at mf, depth = floor(log2(min(igres)))), one
    rank higher. Up-sampling uses nearest-neighbor repeat + Conv4d
    (a transposed factorized conv is not expressible as one XLA op).
    """

    in_features: int = 4
    out_features: int = 32
    igres: Sequence[int] = (4, 8, 8, 8)
    nf: int = 16
    mf: int = 512
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"

    @property
    def levels(self) -> int:
        return int(math.floor(math.log2(min(self.igres))))

    @nn.compact
    def __call__(self, x):
        if tuple(x.shape[1:5]) != tuple(self.igres):
            raise ValueError(
                f"UNet4d built for igres={tuple(self.igres)}, "
                f"got input grid {x.shape[1:5]}")
        lv = self.levels
        for r in self.igres:
            if r % (2 ** lv) != 0:
                raise ValueError(
                    f"igres {tuple(self.igres)} not divisible by 2^{lv}")
        x = x.astype(self.dtype)
        act = get_activation(self.activation, self.negative_slope)

        h = act(Conv4d(self.nf, 3, 3, dtype=self.dtype, name="conv_in")(x))

        skips = []
        ch = self.nf
        for i in range(lv):
            h = ResBlock4D(max(ch // 2, 1), ch, self.negative_slope,
                           self.dtype, self.activation,
                           name=f"down_res{i}")(h)
            skips.append(h)
            ch = min(ch * 2, self.mf)
            h = act(Conv4d(ch, 3, 3, strides=(2, 2, 2, 2),
                           dtype=self.dtype, name=f"down{i}")(h))

        h = ResBlock4D(max(ch // 2, 1), ch, self.negative_slope,
                       self.dtype, self.activation, name="bottleneck")(h)

        for i in reversed(range(lv)):
            skip = skips[i]
            ch = skip.shape[-1]
            # Nearest-neighbor x2 on all four axes, then conv.
            for ax in (1, 2, 3, 4):
                h = jnp.repeat(h, 2, axis=ax)
            h = act(Conv4d(ch, 3, 3, dtype=self.dtype, name=f"up{i}")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResBlock4D(max(ch // 2, 1), ch, self.negative_slope,
                           self.dtype, self.activation,
                           name=f"up_res{i}")(h)

        out = Conv4d(self.out_features, 1, 1, dtype=self.dtype,
                     name="conv_out")(h)
        return out.astype(jnp.float32)
