"""Weight-normalized conv layers + snake activation, channels-last (NWC).

Weight norm is kept as an explicit (g, v) parametrization — matching torch's
`weight_norm` semantics (norm over all axes except the g axis) so that
checkpoints convert exactly and training dynamics match the reference codec
family (reference vampnet/modules/layers.py:47-52; lac/DAC use the same
wrappers). The effective kernel is recomputed per call; XLA constant-folds it
per parameter set, so there is no runtime cost at inference.

Each conv has two computation paths selected by `impl`:

  * "xla"    — `lax.conv_general_dilated`. For the TRANSPOSED convs this
               lowers through lhs_dilation: the MXU convolves over the
               zero-inserted input, wasting a factor of `stride` in FLOPs
               (8x on the codec's first two decoder blocks).
  * "matmul" — the convs restructured as plain MXU matmuls:
               - k=1: a Dense;
               - stride 1, dilation d: im2col over the k taps -> one
                 (t, k*c_in) @ (k*c_in, c_out) matmul;
               - stride s, k=2s (the codec's downsampling convs): frame the
                 input into s-sample frames; each output sees exactly two
                 adjacent frames -> one (t/s, 2s*c_in) @ (2s*c_in, c_out);
               - TRANSPOSED stride s, k=2s: polyphase — one
                 (t, c_in) @ (c_in, 2s*c_out) matmul, then a 2-frame
                 overlap-add; no zero-dilated compute at all.

The parameters are identical between paths (same (g, v, bias) tree), so
checkpoints, converters and training see one layer; only the schedule of the
arithmetic changes (result differs by float accumulation order only).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.activations import snake


def _conv1d_matmul(x, w, stride: int, padding: int, dilation: int):
    """Correlation conv via matmuls. x (b, t, c_in), w (out, in, k) effective
    weight; returns (b, t_out, c_out) matching lax.conv_general_dilated with
    the same stride/padding/rhs_dilation."""
    b, t, c_in = x.shape
    c_out, _, k = w.shape
    if k == 1 and stride == 1 and padding == 0:
        return x @ w[:, :, 0].T
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    tp = xp.shape[1]
    if stride == 1:
        t_out = tp - (k - 1) * dilation
        if c_in < 128:
            # narrow channels: im2col — one matmul with contraction k*c_in
            # (taps-major, channel-minor, matching w (out,in,k) ->
            # (k,in,out) -> (k*in,out)) so the MXU contraction dim is full
            cols = jnp.concatenate(
                [jax.lax.dynamic_slice_in_dim(xp, j * dilation, t_out, axis=1)
                 for j in range(k)],
                axis=-1,
            )
            wm = jnp.transpose(w, (2, 1, 0)).reshape(k * c_in, c_out)
            return cols @ wm
        # wide channels: contraction c_in already fills the MXU; accumulate
        # k shifted matmuls instead of materializing a k-times-wider im2col
        y = None
        for j in range(k):
            xj = jax.lax.dynamic_slice_in_dim(xp, j * dilation, t_out, axis=1)
            yj = xj @ w[:, :, j].T
            y = yj if y is None else y + yj
        return y
    # strided path: only the codec's k == 2s downsamplers are supported
    assert dilation == 1 and k == 2 * stride, (stride, k, dilation)
    s = stride
    t_out = (tp - k) // s + 1
    # frame xp into s-sample frames; window t_out*s .. +2s = two adjacent
    # frames. Pad tp up to a frame multiple covering t_out + 1 frames.
    n_frames = t_out + 1
    need = n_frames * s
    if need > tp:
        xp = jnp.pad(xp, ((0, 0), (0, need - tp), (0, 0)))
    frames = xp[:, : n_frames * s].reshape(b, n_frames, s * c_in)
    g = jnp.concatenate([frames[:, :-1], frames[:, 1:]], axis=-1)  # (b,t_out,2s*c)
    wm = jnp.transpose(w, (2, 1, 0)).reshape(k * c_in, c_out)
    return g @ wm


def _conv_transpose1d_matmul(x, w, stride: int, padding: int):
    """Polyphase transposed conv. x (b, t, c_in), w (in, out, k) effective
    weight (torch ConvTranspose1d layout, k == 2*stride); out length
    (t-1)*s - 2p + k. One (t, c_in) @ (c_in, k*c_out) matmul + overlap-add —
    no zero-insertion, so the MXU does 1/s of the lhs_dilation FLOPs."""
    b, t, c_in = x.shape
    _, c_out, k = w.shape
    s = stride
    assert k == 2 * s, (k, s)
    wm = jnp.transpose(w, (0, 2, 1)).reshape(c_in, k * c_out)
    a = (x @ wm).reshape(b, t, 2, s, c_out)
    head, tail = a[:, :, 0], a[:, :, 1]  # contributions at frame t and t+1
    full = jnp.pad(head, ((0, 0), (0, 1), (0, 0), (0, 0))) + jnp.pad(
        tail, ((0, 0), (1, 0), (0, 0), (0, 0))
    )  # (b, t+1, s, c_out): frame u holds raw outputs [u*s, (u+1)*s)
    full = full.reshape(b, (t + 1) * s, c_out)
    out_len = (t - 1) * s - 2 * padding + k
    return jax.lax.dynamic_slice_in_dim(full, padding, out_len, axis=1)


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
    impl: str = "xla"  # xla | matmul (see module docstring)

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
        if self.impl == "matmul" and (
            self.stride == 1 or self.kernel_size == 2 * self.stride
        ):
            y = _conv1d_matmul(
                x.astype(self.dtype), w.astype(self.dtype),
                self.stride, self.padding, self.dilation,
            )
        else:
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
    impl: str = "xla"  # xla | matmul (polyphase; see module docstring)

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
        if self.impl == "matmul" and k == 2 * self.stride:
            y = _conv_transpose1d_matmul(
                x.astype(self.dtype), w.astype(self.dtype),
                self.stride, self.padding,
            )
        else:
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
