"""Activation functions (reference vampnet/modules/activations.py).

Pure jnp functions — XLA fuses these into surrounding matmuls, which replaces
the reference's torch.jit.script of snake (reference vampnet/modules/layers.py:12).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def new_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """tanh-approximated GELU (reference activations.py:9)."""
    return 0.5 * x * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0)))
    )


def gated_gelu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """GEGLU: first half gates the GELU of the second half
    (reference activations.py:28)."""
    p1, p2 = jnp.split(x, 2, axis=axis)
    return p1 * new_gelu(p2)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin^2(alpha x)/alpha (reference layers.py:12-18).

    `alpha` broadcasts over the channel axis (channels-last here, vs the
    reference's channels-second torch layout).
    """
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


def get_activation(name: str = "relu"):
    if name == "relu":
        return lambda x: jnp.maximum(x, 0)
    elif name == "gelu":
        return new_gelu
    elif name == "geglu":
        return gated_gelu
    else:
        raise ValueError(f"Unrecognized activation {name}")
