"""UNet3D spatiotemporal encoder — low-res fields -> latent context grid.

TPU-native equivalent of the reference's ``src/unet3d.py::UNet3d`` /
``ResBlock3D``: lift the physical channels to ``nf``, encode with
bottleneck residual blocks + strided-conv downsampling (doubling
filters, capped at ``mf``), decode symmetrically with transposed-conv
upsampling and skip connections, and emit a latent grid at the SAME
(t, z, x) resolution as the low-res input.

TPU-first design decisions (vs a literal torch translation):
- channels-LAST ``[B, T, Z, X, C]`` (NDHWC) layout — XLA's native conv
  layout on TPU, keeping the channel axis on the 128-lane minor dim;
- GroupNorm by DEFAULT instead of BatchNorm: batch-size independent
  (works with per-device micro-batches under data parallelism with no
  cross-device batch-stat sync) and keeps the train step purely
  functional — no mutable running stats to thread through jit. A
  reference-faithful BatchNorm mode (``norm="batch"``, cross-replica
  stats via ``bn_axis_name``) is available for strict parity runs and
  for importing reference torch checkpoints;
- depth is a static Python int derived from the input grid resolution
  (``levels = floor(log2(min(igres)))`` like the reference), so the
  whole network unrolls into one fixed XLA graph.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from space_time_pde_tpu.models.nonlinearities import get_activation

__all__ = ["UNet3d", "ResBlock3D"]


def _num_groups(ch: int) -> int:
    """Largest group count <= 8 that divides ch (GroupNorm constraint)."""
    for g in (8, 4, 2, 1):
        if ch % g == 0:
            return g
    return 1


def make_norm(norm: str, ch: int, name: str, train: bool,
              bn_axis_name: Optional[str] = None) -> nn.Module:
    """Norm-layer factory shared by the 3-D and 4-D blocks.

    ``group``: GroupNorm (default, functional). ``batch``: BatchNorm
    with torch-matching semantics (momentum 0.9 i.e. torch's 0.1, eps
    1e-5, running stats in the ``batch_stats`` collection); with
    ``bn_axis_name`` set the batch statistics are averaged across that
    mesh axis (cross-replica sync — the reference's single-process
    ``nn.DataParallel`` computes per-replica stats, so syncing is at
    least as faithful).
    """
    if norm == "batch":
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.9, epsilon=1e-5,
                            axis_name=bn_axis_name, name=name)
    if norm == "group":
        return nn.GroupNorm(_num_groups(ch), name=name)
    raise ValueError(f"unknown norm {norm!r}; available: group, batch")


class ResBlock3D(nn.Module):
    """Bottleneck residual block (reference: ``src/unet3d.py::ResBlock3D``).

    1x1x1 reduce -> 3x3x3 -> 1x1x1 expand, norm + activation, with a
    projected identity shortcut when channel counts differ.
    """

    neck_channels: int
    out_channels: int
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"
    norm: str = "group"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = get_activation(self.activation, self.negative_slope)
        mk = lambda ch, name: make_norm(self.norm, ch, name, train,
                                        self.bn_axis_name)
        h = nn.Conv(self.neck_channels, (1, 1, 1), dtype=self.dtype,
                    name="conv1")(x)
        h = act(mk(self.neck_channels, "norm1")(h))
        h = nn.Conv(self.neck_channels, (3, 3, 3), padding="SAME",
                    dtype=self.dtype, name="conv2")(h)
        h = act(mk(self.neck_channels, "norm2")(h))
        h = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype,
                    name="conv3")(h)
        h = mk(self.out_channels, "norm3")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1, 1), use_bias=False,
                        dtype=self.dtype, name="proj")(x)
        return act(h + x)


class UNet3d(nn.Module):
    """3-D (t, z, x) U-Net encoder producing a latent context grid.

    Reference parity: ``src/unet3d.py::UNet3d`` — same-resolution output
    (`igres` in == latent grid out), filter doubling per level capped at
    ``mf``, depth = floor(log2(min(igres))).

    Attributes:
      in_features: physical input channels (4: p, b, u, w).
      out_features: latent dims of the context grid (``lat_dims``).
      igres: static (T, Z, X) input grid resolution — determines depth;
        every entry must be divisible by 2**levels.
      nf: base filter count.
      mf: max filter cap.
    """

    in_features: int = 4
    out_features: int = 32
    igres: Sequence[int] = (4, 16, 16)
    nf: int = 16
    mf: int = 512
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    activation: str = "leaky_relu"
    norm: str = "group"
    bn_axis_name: Optional[str] = None

    @property
    def levels(self) -> int:
        return int(math.floor(math.log2(min(self.igres))))

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, T, Z, X, in_features] -> [B, T, Z, X, out_features]."""
        if tuple(x.shape[1:4]) != tuple(self.igres):
            raise ValueError(
                f"UNet3d built for igres={tuple(self.igres)}, "
                f"got input grid {x.shape[1:4]}")
        lv = self.levels
        for r in self.igres:
            if r % (2 ** lv) != 0:
                raise ValueError(
                    f"igres {tuple(self.igres)} not divisible by 2^{lv}")
        x = x.astype(self.dtype)
        act = get_activation(self.activation, self.negative_slope)
        block = lambda neck, ch, name: ResBlock3D(
            neck, ch, self.negative_slope, self.dtype, self.activation,
            self.norm, self.bn_axis_name, name=name)

        # Lift to nf.
        h = act(nn.Conv(self.nf, (3, 3, 3), padding="SAME",
                        dtype=self.dtype, name="conv_in")(x))

        # Encoder: ResBlock then strided downsample, doubling filters.
        skips = []
        ch = self.nf
        for i in range(lv):
            h = block(max(ch // 2, 1), ch, f"down_res{i}")(h, train)
            skips.append(h)
            ch = min(ch * 2, self.mf)
            h = act(nn.Conv(ch, (3, 3, 3), strides=(2, 2, 2),
                            padding="SAME", dtype=self.dtype,
                            name=f"down{i}")(h))

        # Bottleneck.
        h = block(max(ch // 2, 1), ch, "bottleneck")(h, train)

        # Decoder: transposed-conv upsample + skip concat + ResBlock.
        for i in reversed(range(lv)):
            skip = skips[i]
            ch = skip.shape[-1]
            h = act(nn.ConvTranspose(ch, (2, 2, 2), strides=(2, 2, 2),
                                     dtype=self.dtype, name=f"up{i}")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(max(ch // 2, 1), ch, f"up_res{i}")(h, train)

        # Latent head (linear — the latent grid is unbounded features).
        out = nn.Conv(self.out_features, (1, 1, 1), dtype=self.dtype,
                      name="conv_out")(h)
        return out.astype(jnp.float32)
