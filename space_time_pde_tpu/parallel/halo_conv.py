"""Spatially-sharded convolution building blocks (halo convs).

Foundation for running the UNet3d ENCODER on a latent grid sharded
along x across a mesh axis (grids larger than one chip's HBM — the
follow-up flagged in parallel/dp_sp.py). The reference has no
equivalent (its encoder is single-GPU); this is standard TPU-native
halo-conv machinery:

- :func:`halo_exchange_x`: ppermute one-hop exchange of ``halo`` edge
  planes with both neighbors, zero-filled at the global domain edges so
  a VALID conv over the widened block equals the global SAME conv.
- :class:`HaloConv3d`: 3-D conv on ``[B, T, Z, X_loc, C]`` shards —
  SAME in t/z, halo-exchange + VALID in x; stride 2 supported (left
  halo 1, no right halo, matching XLA's SAME-pad stride-2 geometry for
  even sizes).
- :class:`ShardedGroupNorm`: GroupNorm whose per-(sample, group)
  statistics are reduced across the mesh axis with psums, so sharded
  execution is numerically identical to unsharded.

All modules take ``axis_name`` and must run inside ``shard_map``. With
a mesh axis of size 1 they reduce exactly to the unsharded ops, which
is how parity is tested (same params, n=1 vs n=4 execution).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["halo_exchange_x", "HaloConv3d", "ShardedGroupNorm"]


def halo_exchange_x(h: jnp.ndarray, axis_name: str, left: int = 1,
                    right: int = 1) -> jnp.ndarray:
    """Widen ``[..., X_loc, C]`` with neighbor planes along axis -2.

    Receives ``left`` planes from the left neighbor's right edge and
    ``right`` planes from the right neighbor's left edge; zeros at the
    global domain edges (SAME-conv padding semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if left > 0:
        own_right = h[..., -left:, :]
        from_left = jax.lax.ppermute(
            own_right, axis_name, perm=[(s, (s + 1) % n) for s in range(n)])
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left),
                              from_left)
        parts.append(from_left)
    parts.append(h)
    if right > 0:
        own_left = h[..., :right, :]
        from_right = jax.lax.ppermute(
            own_left, axis_name, perm=[(s, (s - 1) % n) for s in range(n)])
        from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right),
                               from_right)
        parts.append(from_right)
    return jnp.concatenate(parts, axis=-2)


class HaloConv3d(nn.Module):
    """3-D conv on an x-sharded block: SAME in (t, z), halo'd in x.

    kernel must be odd in x for stride 1. For stride 2 (kernel 3) the
    local x size must be even; geometry matches XLA SAME padding
    (pad_left=1, pad_right=0 when X is even).

    Parameters are ``kernel``/``bias`` at THIS module's scope with
    ``nn.Conv``'s shapes and initializers, so a HaloConv3d named like a
    plain ``nn.Conv`` produces an IDENTICAL parameter subtree — the
    property that makes UNet3d and ShardedUNet3d checkpoints
    interchangeable (one checkpoint, either execution layout).
    """

    features: int
    kernel_size: Sequence[int] = (3, 3, 3)
    strides: Sequence[int] = (1, 1, 1)
    axis_name: str = "space"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kz, kx = self.kernel_size
        st, sz, sx = self.strides
        if sx == 1:
            left = right = (kx - 1) // 2
        elif sx == 2:
            if x.shape[3] % 2 != 0:
                raise ValueError("stride-2 HaloConv3d needs even local x")
            # XLA SAME (k=3, s=2, even X): total pad 1 goes on the
            # RIGHT (out j reads inputs [2j, 2j+2]).
            left, right = 0, kx - 1 - (kx - 1) // 2
        else:
            raise ValueError(f"unsupported x stride {sx}")
        h = halo_exchange_x(x, self.axis_name, left, right)

        def same_pad(n, k, s):
            # XLA SAME: out = ceil(n/s); extra padding goes HIGH.
            total = max((-(-n // s) - 1) * s + k - n, 0)
            return (total // 2, total - total // 2)

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kz, kx, x.shape[-1], self.features))
        y = jax.lax.conv_general_dilated(
            h.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(st, sz, sx),
            padding=(same_pad(x.shape[1], kt, st),
                     same_pad(x.shape[2], kz, sz), (0, 0)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class ShardedGroupNorm(nn.Module):
    """GroupNorm with cross-shard statistics (psum over axis_name).

    Matches flax ``nn.GroupNorm(num_groups)`` applied to the unsharded
    array: mean/var per (sample, group) over all spatial positions and
    the group's channels, reduced across the mesh axis.
    """

    num_groups: int
    axis_name: str = "space"
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        b = x.shape[0]
        xg = x.reshape(b, -1, g, c // g)          # [B, S_loc, G, C/G]
        cnt = jax.lax.psum(
            jnp.asarray(xg.shape[1] * xg.shape[3], jnp.float32),
            self.axis_name)
        mean = jax.lax.psum(jnp.sum(xg, axis=(1, 3)), self.axis_name) / cnt
        mean_sq = jax.lax.psum(jnp.sum(jnp.square(xg), axis=(1, 3)),
                               self.axis_name) / cnt
        var = mean_sq - jnp.square(mean)          # [B, G]
        inv = jax.lax.rsqrt(var + self.epsilon)
        xn = (xg - mean[:, None, :, None]) * inv[:, None, :, None]
        xn = xn.reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return xn * scale + bias
