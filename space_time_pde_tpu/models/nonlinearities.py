"""Selectable nonlinearity registry.

Reference parity: the upstream repo keeps a small registry module
(``src/nonlinearities.py``) mapping activation names to callables,
consumed by the ``ImNet`` / ``UNet3d`` constructors so experiments can
swap activations by flag. This is the JAX equivalent; every entry is an
elementwise ``jnp``-traceable function suitable for use inside ``jit``,
``shard_map`` and Pallas kernel bodies.

Two properties matter downstream:

- ``PIECEWISE_LINEAR``: activations whose second derivative is zero
  everywhere (a.e. and under the autodiff ``where``-rule). The analytic
  derivative jet (``ops/jet.py``) is exact ONLY for decoders built from
  these; the trainer falls back to nested-jvp towers otherwise.
- every function must be defined at bf16 inputs without overflow in the
  activation itself (the models cast around them).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["NONLINEARITIES", "PIECEWISE_LINEAR", "get_activation"]

# name -> fn(x, negative_slope). Most ignore the slope; keeping one
# uniform signature lets callers close over config once.
NONLINEARITIES = {
    "relu": lambda x, ns: jax.nn.relu(x),
    "leaky_relu": lambda x, ns: jax.nn.leaky_relu(x, ns),
    "elu": lambda x, ns: jax.nn.elu(x),
    "gelu": lambda x, ns: jax.nn.gelu(x),
    "silu": lambda x, ns: jax.nn.silu(x),
    "swish": lambda x, ns: jax.nn.silu(x),
    "softplus": lambda x, ns: jax.nn.softplus(x),
    "tanh": lambda x, ns: jnp.tanh(x),
    "sigmoid": lambda x, ns: jax.nn.sigmoid(x),
    "sin": lambda x, ns: jnp.sin(x),
}

# Second coordinate derivative is exactly zero -> ops/jet.py is exact.
PIECEWISE_LINEAR = frozenset({"relu", "leaky_relu"})


def get_activation(name: str,
                   negative_slope: float = 0.01) -> Callable:
    """Resolve an activation name to a unary ``fn(x)``.

    Raises ``ValueError`` with the available names on a bad name (the
    reference registry raises ``NotImplementedError`` similarly).
    """
    try:
        fn = NONLINEARITIES[name]
    except KeyError:
        raise ValueError(
            f"unknown activation {name!r}; available: "
            f"{sorted(NONLINEARITIES)}") from None
    return lambda x: fn(x, negative_slope)
