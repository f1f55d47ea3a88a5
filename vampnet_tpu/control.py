"""Control signals for sketch2sound conditioning (reference vampnet/control.py).

Feature extractors produce per-frame control tensors aligned to codec tokens:
  RMS           — windowed loudness envelope, optionally quantized and
                  median-filtered (the "rmsq16" family in conf/lora/lora-s2s.yml)
  HarmonicChroma— STFT -> harmonic/percussive separation (median-filter HPSS)
                  -> chroma filterbank -> top-n softmax

All extractors are pure jnp and jit-friendly (the reference's torch/torchaudio
versions are host-bound). The reference module is dead code in-repo (it
imports vampnet.dsp.signal which does not exist, reference control.py:7-9);
this implementation restores the capability against our AudioSignal.

Layout: controls are (batch, time, dim) — channels-last like the rest of the
TPU stack (the reference uses (batch, dim, time)).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .newmask import random_along_time


# ---------------- primitives ----------------


def frame(x: jnp.ndarray, window_length: int, hop_length: int) -> jnp.ndarray:
    """(..., t) -> (..., n_frames, window_length) with reflect pad (stft-like)."""
    pad = window_length // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - window_length) // hop_length
    idx = (
        jnp.arange(window_length)[None, :]
        + jnp.arange(n_frames)[:, None] * hop_length
    )
    return x[..., idx]


def rms(wav: jnp.ndarray, window_length: int = 2048, hop_length: int = 512) -> jnp.ndarray:
    """Windowed RMS envelope: (b, t) -> (b, n_frames)."""
    frames = frame(wav, window_length, hop_length)
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1) + 1e-12)


def median_filter_1d(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Median filter along the last axis (edge-padded)."""
    if size <= 1:
        return x
    half = size // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, size - 1 - half)], mode="edge")
    windows = jnp.stack([xp[..., i : i + x.shape[-1]] for i in range(size)], axis=-1)
    return jnp.median(windows, axis=-1)


def stft_mag(wav: jnp.ndarray, window_length: int, hop_length: int) -> jnp.ndarray:
    """(b, t) -> magnitude spectrogram (b, n_freq, n_frames)."""
    frames = frame(wav, window_length, hop_length)  # (b, n_frames, w)
    win = jnp.hanning(window_length)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(jnp.swapaxes(spec, -1, -2))


def hpss_harmonic(spec: jnp.ndarray, kernel_size: int = 51, hard: bool = True) -> jnp.ndarray:
    """Harmonic component via median-filter HPSS (Fitzgerald 2010):
    harmonic = smooth along time, percussive = smooth along frequency."""
    harm = median_filter_1d(spec, kernel_size)  # along time (last axis)
    perc = jnp.swapaxes(
        median_filter_1d(jnp.swapaxes(spec, -1, -2), kernel_size), -1, -2
    )
    if hard:
        mask = (harm >= perc).astype(spec.dtype)
    else:
        mask = jnp.square(harm) / (jnp.square(harm) + jnp.square(perc) + 1e-12)
    return spec * mask


def chroma_filterbank(
    sample_rate: int, n_freqs: int, n_chroma: int = 12, octwidth: float = 5.0,
    tuning: float = 0.0,
) -> np.ndarray:
    """librosa-style chroma filterbank (n_chroma, n_freqs): gaussian bumps over
    wrapped log-frequency with a gaussian octave-centering window."""
    n_fft = 2 * (n_freqs - 1)
    frequencies = np.linspace(0, sample_rate, n_fft, endpoint=False)[1:n_freqs]
    frqbins = n_chroma * np.log2(frequencies / (sample_rate / 2 ** (5 - tuning / n_chroma)))
    frqbins = np.concatenate([[frqbins[0] - 1.5 * n_chroma], frqbins])
    binwidthbins = np.concatenate([np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1]])
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts /= np.sqrt(np.sum(wts**2, axis=0, keepdims=True) + 1e-12)
    if octwidth is not None:
        ctroct = 5.0
        wts *= np.tile(
            np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
            (n_chroma, 1),
        )
    return np.ascontiguousarray(wts[:, :n_freqs].astype(np.float32))


# ---------------- extractors ----------------


class RMSControl:
    """Reference control.py:38-84 (the rms/rmsq* controllers)."""

    def __init__(
        self,
        hop_length: int,
        window_length: int = 2048,
        n_quantize: Optional[int] = None,
        sample_rate: int = 44100,
        median_filter_size: Optional[int] = None,
    ):
        self.hop_length = hop_length
        self.window_length = window_length
        self.n_quantize = n_quantize
        self.sample_rate = sample_rate
        self.median_filter_size = median_filter_size

    @property
    def dim(self) -> int:
        return 1

    def extract(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav (b, t) -> (b, n_frames, 1)."""
        r = rms(wav, self.window_length, self.hop_length)[:, :-1]  # match DAC frames
        if self.n_quantize is not None:
            lo, hi = jnp.min(r), jnp.max(r)
            r = (r - lo) / jnp.maximum(hi - lo, 1e-9)
            r = jnp.round(r * self.n_quantize) / self.n_quantize
        if self.median_filter_size is not None:
            r = median_filter_1d(r, self.median_filter_size)
        return r[:, :, None]


class HarmonicChromaControl:
    """Reference control.py:88-177."""

    def __init__(
        self,
        hop_length: int,
        window_length: int = 4096,
        n_chroma: int = 48,
        sample_rate: int = 44100,
        top_n: int = 0,
    ):
        self.hop_length = hop_length
        self.window_length = window_length
        self.n_chroma = n_chroma
        self.sample_rate = sample_rate
        self.top_n = top_n
        self._fb = jnp.asarray(
            chroma_filterbank(sample_rate, window_length // 2 + 1, n_chroma)
        )

    @property
    def dim(self) -> int:
        return self.n_chroma

    def extract(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav (b, t) -> (b, n_frames, n_chroma)."""
        spec = stft_mag(wav, self.window_length, self.hop_length)
        spec = hpss_harmonic(spec, kernel_size=51, hard=True)
        chroma = jnp.einsum("cf,bft->bct", self._fb, spec)

        # silence gating via frame RMS in dB (reference :137-145)
        frame_rms = jnp.sqrt(jnp.mean(jnp.square(spec), axis=1) + 1e-12)
        rms_db = 10 * jnp.log10(frame_rms + 1e-7)
        gate = (rms_db >= -40).astype(chroma.dtype)[:, None, :]

        chroma = jnp.where(chroma < 100, 0.0, chroma)  # reference :148
        if self.top_n:
            kth = jax.lax.top_k(jnp.swapaxes(chroma, 1, 2), self.top_n)[0][..., -1]
            keep = chroma >= jnp.swapaxes(kth[..., None], 1, 2)
            chroma = chroma * keep
        chroma = chroma * gate
        if self.top_n > 0:
            sm = jax.nn.softmax(chroma, axis=1)
            # zero out frames that were all-zero pre-softmax (uniform rows)
            allzero = jnp.all(chroma == 0, axis=1, keepdims=True)
            chroma = jnp.where(allzero, 0.0, sm)
        return jnp.swapaxes(chroma, 1, 2)[:, :-1, :]  # (b, t, c), match DAC frames


CONTROLLERS = {
    "rms": RMSControl,
    "rmsq128": functools.partial(RMSControl, n_quantize=128),
    "rmsq16": functools.partial(RMSControl, n_quantize=16),
    "rms-median": functools.partial(RMSControl, median_filter_size=5),
    "rmsq16-median": functools.partial(RMSControl, n_quantize=16, median_filter_size=3),
    "hchroma": HarmonicChromaControl,
    "hchroma-12c-top2": functools.partial(HarmonicChromaControl, n_chroma=12, top_n=2),
    "hchroma-36c-top3": functools.partial(HarmonicChromaControl, n_chroma=36, top_n=3),
}


class Sketch2SoundController:
    """Reference control.py:193-235."""

    def __init__(self, ctrl_keys: List[str], hop_length: int, sample_rate: int):
        assert all(k in CONTROLLERS for k in ctrl_keys), (
            f"got an unsupported control key in {ctrl_keys}!\n"
            f"  supported: {list(CONTROLLERS)}"
        )
        self.ctrl_keys = ctrl_keys
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.controllers = {
            k: CONTROLLERS[k](hop_length=hop_length, sample_rate=sample_rate)
            for k in ctrl_keys
        }

    @property
    def ctrl_dims(self) -> Dict[str, int]:
        return {k: c.dim for k, c in self.controllers.items()}

    def extract(self, wav: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """wav (b, t) -> {key: (b, frames, dim)}."""
        return {k: c.extract(wav) for k, c in self.controllers.items()}

    def random_mask(self, ctrls: Dict[str, jnp.ndarray], r, key: jax.Array):
        masks = {}
        for i, (k, ctrl) in enumerate(ctrls.items()):
            sub = jax.random.fold_in(key, i)
            dummy = jnp.zeros((ctrl.shape[0], 1, ctrl.shape[1]), jnp.int32)
            masks[k] = 1 - random_along_time(sub, dummy, r)
        return masks

    def empty_mask(self, ctrls: Dict[str, jnp.ndarray]):
        first = next(iter(ctrls.values()))
        mask = jnp.zeros(first.shape[:2], jnp.int32)
        return {k: mask for k in ctrls}
