"""Weight-normalized conv layers + snake activation, channels-last (NWC).

Weight norm is kept as an explicit (g, v) parametrization — matching torch's
`weight_norm` semantics (norm over all axes except the g axis) so that
checkpoints convert exactly and training dynamics match the reference codec
family (reference vampnet/modules/layers.py:47-52; lac/DAC use the same
wrappers). The effective kernel is recomputed per call; XLA constant-folds it
per parameter set, so there is no runtime cost at inference.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.activations import snake


class Snake1d(nn.Module):
    """Snake activation with learned per-channel alpha (channels-last)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return snake(x, alpha[None, None, :].astype(x.dtype))


class WNConv1d(nn.Module):
    """weight_norm(Conv1d) — torch-compatible parametrization.

    Params: v (out, in, k) + g (out,) (torch weight_norm dim=0), bias (out,).
    Input/output are channels-last (b, t, c).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.he_normal(in_axis=1, out_axis=0),
            (self.features, in_features, self.kernel_size),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(self.features, -1), axis=1
            ),
            (self.features,),
        )
        norm = jnp.linalg.norm(v.reshape(self.features, -1), axis=1)
        w = (g / (norm + 1e-12))[:, None, None] * v  # (out, in, k)
        kernel = jnp.transpose(w, (2, 1, 0)).astype(self.dtype)  # (k, in, out)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """weight_norm(ConvTranspose1d) — torch-compatible.

    Params: v (in, out, k) + g (in,) (torch weight_norm dim=0 over the
    ConvTranspose weight layout), bias (out,). Implemented as an
    input-dilated conv with a spatially-flipped kernel — the standard
    equivalence, exact to torch's output length (T-1)*s - 2p + k.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        v = self.param(
            "v",
            nn.initializers.he_normal(in_axis=0, out_axis=1),
            (in_features, self.features, k),
            jnp.float32,
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v.reshape(in_features, -1), axis=1),
            (in_features,),
        )
        norm = jnp.linalg.norm(v.reshape(in_features, -1), axis=1)
        w = (g / (norm + 1e-12))[:, None, None] * v  # (in, out, k)
        kernel = jnp.transpose(w[:, :, ::-1], (2, 0, 1)).astype(self.dtype)  # (k, in, out)
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y
