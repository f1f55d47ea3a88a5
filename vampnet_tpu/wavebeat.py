"""WaveBeat (dsTCN) beat/downbeat tracker, TPU-native.

The reference gets beat masks from the external `wavebeat` package's
dsTCNModel (reference vampnet/beats.py:203-223, `predict_beats_from_array`).
That package is a PyTorch Lightning model: a stack of downsampling temporal
conv blocks (conv -> BatchNorm -> PReLU, plus a strided 1x1-conv residual),
followed by a 1x1 conv to 2 activation channels (beat, downbeat) at
sample_rate / stride**nblocks frames/s, peak-picked after a sigmoid
(Steinmetz & Reiss, "WaveBeat: End-to-end beat and downbeat tracking in the
time domain", AES 151).

TPU-first design decisions:
  * inference-only flax model with **BatchNorm folded into the convs at
    conversion time** — the network becomes conv/PReLU/add only, one jitted
    program, no batch_stats plumbing;
  * input padded to a fixed grid so repeated calls share a compilation;
  * peak-picking on host (scipy), matching the reference eval's
    find_peaks(height=threshold, distance=frame_rate/4) recipe.

The torch->flax converter reads the Lightning checkpoint's
`hyper_parameters` for the layer plan (nblocks/kernel/stride/dilations) and
infers channel widths from the state-dict shapes, so it tracks the real
`wavebeat.pth` layout rather than hard-coded defaults.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn


# ---------------- config ----------------


@dataclasses.dataclass(frozen=True)
class DsTCNBlockConfig:
    in_ch: int
    out_ch: int
    kernel_size: int
    stride: int
    dilation: int


@dataclasses.dataclass(frozen=True)
class DsTCNConfig:
    """Defaults follow the published WaveBeat model: 8 blocks, stride 2
    (256x total downsample of 22.05 kHz audio -> ~86 fps activations),
    kernel 15, dilation cycle 1,8,1,8,..., channels growing by 32."""

    sample_rate: int = 22050
    noutputs: int = 2
    blocks: Tuple[DsTCNBlockConfig, ...] = ()

    @staticmethod
    def build(
        ninputs: int = 1,
        noutputs: int = 2,
        nblocks: int = 8,
        kernel_size: int = 15,
        stride: int = 2,
        dilation_growth: int = 8,
        dilation_cycle: int = 2,
        channel_growth: int = 32,
        channel_width: int = 32,
        sample_rate: int = 22050,
    ) -> "DsTCNConfig":
        blocks: List[DsTCNBlockConfig] = []
        in_ch = ninputs
        for n in range(nblocks):
            out_ch = channel_width if n == 0 else in_ch + channel_growth
            dilation = dilation_growth ** (n % dilation_cycle)
            blocks.append(
                DsTCNBlockConfig(in_ch, out_ch, kernel_size, stride, dilation)
            )
            in_ch = out_ch
        return DsTCNConfig(
            sample_rate=sample_rate, noutputs=noutputs, blocks=tuple(blocks)
        )

    @property
    def total_stride(self) -> int:
        return math.prod(b.stride for b in self.blocks)

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.total_stride


# ---------------- model ----------------


class DsTCNBlock(nn.Module):
    cfg: DsTCNBlockConfig

    @nn.compact
    def __call__(self, x):  # x: (b, t, in_ch)
        c = self.cfg
        pad = ((c.kernel_size - 1) // 2) * c.dilation
        main = nn.Conv(
            c.out_ch, (c.kernel_size,), strides=(c.stride,),
            kernel_dilation=(c.dilation,), padding=[(pad, pad)], name="conv1",
        )(x)
        alpha = self.param(
            "prelu_alpha", nn.initializers.constant(0.25), (c.out_ch,)
        )
        main = jnp.maximum(main, 0.0) + alpha * jnp.minimum(main, 0.0)
        res = nn.Conv(
            c.out_ch, (1,), strides=(c.stride,), padding="VALID", name="res_conv"
        )(x)
        # torch strided conv with k=1,p=0 sees inputs 0,stride,2stride,...;
        # flax VALID does the same, but lengths can differ by 1 vs the padded
        # main branch — crop to the shorter (identical when t % stride == 0)
        t = min(main.shape[1], res.shape[1])
        return main[:, :t] + res[:, :t]


class DsTCN(nn.Module):
    """Inference dsTCN: blocks + 1x1 output conv -> (b, t', noutputs) logits."""

    config: DsTCNConfig

    @nn.compact
    def __call__(self, x):  # x: (b, t, 1)
        for i, bc in enumerate(self.config.blocks):
            x = DsTCNBlock(bc, name=f"block_{i}")(x)
        return nn.Conv(self.config.noutputs, (1,), name="output")(x)


# ---------------- torch checkpoint conversion ----------------


def _fold_bn(w: np.ndarray, b: Optional[np.ndarray], sd: Dict[str, np.ndarray],
             base: str, eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """Fold a BatchNorm1d (inference) into the preceding conv's (w, b).

    w: torch conv weight (out, in, k). Returns folded (w, b)."""
    if f"{base}.running_mean" not in sd:
        return w, (b if b is not None else np.zeros(w.shape[0], w.dtype))
    mean = sd[f"{base}.running_mean"]
    var = sd[f"{base}.running_var"]
    gamma = sd.get(f"{base}.weight", np.ones_like(mean))
    beta = sd.get(f"{base}.bias", np.zeros_like(mean))
    s = gamma / np.sqrt(var + eps)
    if b is None:
        b = np.zeros(w.shape[0], w.dtype)
    return w * s[:, None, None], (b - mean) * s + beta


def _torch_conv_to_flax(w: np.ndarray) -> jnp.ndarray:
    # torch (out, in, k) -> flax Conv kernel (k, in, out)
    return jnp.asarray(np.transpose(w, (2, 1, 0)))


def dstcn_from_torch_checkpoint(path) -> Tuple[DsTCNConfig, Any]:
    """Convert a wavebeat Lightning checkpoint (`wavebeat.pth` /
    `last.ckpt`-style: {"state_dict", "hyper_parameters"}) to (config, params).

    The layer plan comes from hyper_parameters when present; channel widths
    and kernel sizes are cross-checked against the state-dict shapes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    hp = dict(obj.get("hyper_parameters", {}) or {})
    sd_t = obj.get("state_dict", obj)
    sd = {k: v.detach().cpu().numpy() for k, v in sd_t.items() if hasattr(v, "detach")}
    # Lightning prefixes ("model.") and DDP prefixes
    sd = { _strip(k): v for k, v in sd.items() }

    nblocks = int(hp.get("nblocks", 0))
    if nblocks == 0:
        nblocks = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
        )
    stride = int(hp.get("stride", 2))
    dilation_growth = int(hp.get("dilation_growth", 8))
    dilation_cycle = int(hp.get("dilation_cycle", hp.get("stack_size", 2)))
    sample_rate = int(hp.get("sample_rate", 22050))

    blocks: List[DsTCNBlockConfig] = []
    flat: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for n in range(nblocks):
        base = f"blocks.{n}"
        w1 = sd[f"{base}.conv1.weight"]
        out_ch, in_ch, k = w1.shape
        blocks.append(
            DsTCNBlockConfig(
                in_ch, out_ch, k, stride,
                dilation_growth ** (n % max(dilation_cycle, 1)),
            )
        )
        b1 = sd.get(f"{base}.conv1.bias")
        w1, b1 = _fold_bn(w1, b1, sd, f"{base}.norm1")
        flat[(f"block_{n}", "conv1", "kernel")] = _torch_conv_to_flax(w1)
        flat[(f"block_{n}", "conv1", "bias")] = jnp.asarray(b1)

        alpha = sd.get(f"{base}.act1.weight", np.full((out_ch,), 0.25, np.float32))
        flat[(f"block_{n}", "prelu_alpha")] = jnp.asarray(alpha.reshape(-1))

        wr = sd[f"{base}.res_conv.weight"]
        br = sd.get(f"{base}.res_conv.bias")
        wr, br = _fold_bn(wr, br, sd, f"{base}.res_norm")
        flat[(f"block_{n}", "res_conv", "kernel")] = _torch_conv_to_flax(wr)
        flat[(f"block_{n}", "res_conv", "bias")] = jnp.asarray(br)

    wo = sd["output.weight"] if "output.weight" in sd else sd["output.0.weight"]
    bo = sd.get("output.bias", sd.get("output.0.bias"))
    noutputs = wo.shape[0]
    flat[("output", "kernel")] = _torch_conv_to_flax(wo)
    flat[("output", "bias")] = jnp.asarray(
        bo if bo is not None else np.zeros(noutputs, np.float32)
    )

    import flax.traverse_util as tu

    cfg = DsTCNConfig(
        sample_rate=sample_rate, noutputs=noutputs, blocks=tuple(blocks)
    )
    return cfg, tu.unflatten_dict(flat)


def _strip(k: str) -> str:
    for pref in ("model.", "module.", "_orig_mod."):
        while k.startswith(pref):
            k = k[len(pref):]
    return k


# ---------------- tracker ----------------


class WaveBeatModel:
    """Loaded dsTCN + the reference's prediction recipe
    (wavebeat `predict_beats_from_array`): resample to the model rate,
    peak-normalize, forward, sigmoid, peak-pick beats/downbeats."""

    # one compile per padded-length bucket; grid ~3 s at 22.05 kHz
    _PAD_GRID = 65536

    def __init__(self, config: DsTCNConfig, params: Any):
        self.config = config
        self.params = params
        model = DsTCN(config)
        self._forward = jax.jit(
            lambda p, x: jax.nn.sigmoid(model.apply({"params": p}, x))
        )

    @classmethod
    def from_checkpoint(cls, path) -> "WaveBeatModel":
        # native .vtpu (weight-day converted) or Lightning torch checkpoint
        from .checkpoints import load_wavebeat

        cfg, params = load_wavebeat(path)
        return cls(cfg, params)

    def activations(self, samples: np.ndarray, sr: int) -> np.ndarray:
        """(t,) float audio -> (t', 2) beat/downbeat probabilities."""
        import scipy.signal

        x = np.asarray(samples, np.float32).reshape(-1)
        if sr != self.config.sample_rate:
            g = math.gcd(int(self.config.sample_rate), int(sr))
            x = scipy.signal.resample_poly(
                x, self.config.sample_rate // g, int(sr) // g
            ).astype(np.float32)
        peak = np.abs(x).max()
        if peak > 0:
            x = x / peak
        n = len(x)
        padded = max(self._PAD_GRID, int(np.ceil(n / self._PAD_GRID)) * self._PAD_GRID)
        xp = np.zeros(padded, np.float32)
        xp[:n] = x
        acts = np.asarray(self._forward(self.params, jnp.asarray(xp)[None, :, None]))[0]
        n_frames = int(n // self.config.total_stride)
        return acts[:n_frames]

    def predict_beats_from_array(
        self, samples: np.ndarray, sr: int, threshold: float = 0.5
    ) -> Tuple[np.ndarray, np.ndarray]:
        acts = self.activations(samples, sr)
        fps = self.config.frame_rate
        beats = pick_peaks(acts[:, 0], fps, threshold, max_bpm=240.0)
        downbeats = pick_peaks(
            acts[:, 1] if acts.shape[1] > 1 else acts[:, 0],
            fps, threshold, max_bpm=120.0,
        )
        return beats, downbeats


def pick_peaks(
    activation: np.ndarray, frame_rate: float, threshold: float = 0.5,
    max_bpm: float = 240.0,
) -> np.ndarray:
    """Frame activations -> event times in seconds. Same recipe as the
    wavebeat eval's simple peak picker: find_peaks with a refractory
    distance of one minimum inter-event interval."""
    import scipy.signal

    distance = max(1, int(round(frame_rate * 60.0 / max_bpm)))
    peaks, _ = scipy.signal.find_peaks(
        activation, height=threshold, distance=distance
    )
    return peaks.astype(np.float64) / frame_rate
