"""ImNet implicit decoder — an IM-NET-style coordinate MLP.

TPU-native equivalent of the reference's ``src/implicit_net.py::ImNet``:
input is ``[coord (dim) ⊕ latent (in_features)]``; a pyramid of hidden
layers of widths ``nf*16, nf*8, nf*4, nf*2, nf`` with the *raw input
re-concatenated into every hidden layer* (the IM-NET skip topology),
LeakyReLU activations, and a final linear head to ``out_features``
physical channels.

TPU notes: this MLP is the innermost op of the hottest loop (evaluated
2**dim times per query point). It is written to map onto the MXU as a
chain of dense matmuls over a flattened ``[B*N*2^d, F]`` batch; the
``dtype`` field sets the compute dtype so a bf16 policy keeps the MXU in
its fast path while parameters stay f32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from space_time_pde_tpu.models.nonlinearities import get_activation

__all__ = ["ImNet"]


class ImNet(nn.Module):
    """IM-NET decoder MLP (reference: ``src/implicit_net.py::ImNet``).

    Attributes:
      dim: spatial(-temporal) coordinate dimension (3 for (t, z, x)).
      in_features: latent feature size concatenated to the coordinate.
      out_features: number of predicted physical channels.
      nf: width multiplier; hidden widths are nf*(16, 8, 4, 2, 1).
      activation: name in the nonlinearity registry (reference:
        ``src/nonlinearities.py``). Non-piecewise-linear choices disable
        the analytic derivative jet (``ops/jet.py``) — the trainer falls
        back to jvp towers automatically.
      negative_slope: LeakyReLU slope (torch ``nn.LeakyReLU`` default).
      dtype: compute dtype (params stay float32; bf16 here enables the
        MXU fast path on TPU).
    """

    dim: int = 3
    in_features: int = 32
    out_features: int = 4
    nf: int = 32
    activation: str = "leaky_relu"
    negative_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [..., dim + in_features] -> [..., out_features]."""
        if x.shape[-1] != self.dim + self.in_features:
            raise ValueError(
                f"ImNet expects last dim {self.dim + self.in_features}, "
                f"got {x.shape[-1]}")
        x = x.astype(self.dtype)
        act = get_activation(self.activation, self.negative_slope)
        h = x
        for i, mult in enumerate((16, 8, 4, 2, 1)):
            inp = h if i == 0 else jnp.concatenate([h, x], axis=-1)
            h = nn.Dense(self.nf * mult, dtype=self.dtype,
                         name=f"fc{i}")(inp)
            h = act(h)
        out = nn.Dense(self.out_features, dtype=self.dtype, name="fc5")(h)
        return out.astype(jnp.float32)
