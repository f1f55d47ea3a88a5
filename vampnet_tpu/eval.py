"""Eval metrics: mel-spectrogram loss + Fréchet Audio Distance.

The reference depends on `frechet_audio_distance` (VGGish embeddings) and
`audiotools.metrics.spectral.MelSpectrogramLoss` (reference
scripts/exp/eval.py:27-34). Here both are first-party:

  * `mel_spectrogram_loss` — multi-scale log-mel L1, the audiotools
    formulation (fft sizes 32..2048, slaney mel filterbanks).
  * `FrechetAudioDistance` — Fréchet distance between Gaussian fits of
    per-frame embeddings over two directories/sets. The embedding function is
    pluggable; the default is a log-mel frame embedding (self-contained,
    no pretrained weights needed in this environment). A VGGish-style torch
    embedder can be passed in when available.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence

import numpy as np
import scipy.linalg
import scipy.signal

from .audio import AudioSignal


# ---------------- mel primitives ----------------


def hz_to_mel(f):
    """Slaney mel scale (librosa/audiotools default)."""
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin=0.0, fmax=None) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular slaney filterbank with area norm."""
    fmax = fmax or sr / 2
    n_freqs = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freqs))
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[i] *= enorm
    return fb.astype(np.float32)


def log_mel_spectrogram(
    wav: np.ndarray, sr: int, n_fft: int = 2048, hop: Optional[int] = None,
    n_mels: int = 128,
) -> np.ndarray:
    """(t,) -> (n_mels, frames) log mel."""
    hop = hop or n_fft // 4
    if len(wav) < n_fft:
        wav = np.pad(wav, (0, n_fft - len(wav)))
    _, _, Z = scipy.signal.stft(
        wav, fs=sr, nperseg=n_fft, noverlap=n_fft - hop, boundary="zeros", padded=True
    )
    mag = np.abs(Z)
    fb = mel_filterbank(sr, n_fft, n_mels)
    mel = fb @ mag
    return np.log10(mel + 1e-5)


def mel_spectrogram_loss(
    sig1: AudioSignal,
    sig2: AudioSignal,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
) -> float:
    """Multi-scale log-mel L1 (audiotools MelSpectrogramLoss formulation)."""
    assert sig1.sample_rate == sig2.sample_rate
    x = sig1.samples[0, 0]
    y = sig2.samples[0, 0]
    n = min(len(x), len(y))
    x, y = x[:n], y[:n]
    total = 0.0
    for nm, wl in zip(n_mels, window_lengths):
        mx = log_mel_spectrogram(x, sig1.sample_rate, n_fft=wl, n_mels=nm)
        my = log_mel_spectrogram(y, sig2.sample_rate, n_fft=wl, n_mels=nm)
        total += float(np.abs(mx - my).mean())
    return total / len(n_mels)


# ---------------- Frechet audio distance ----------------


def default_embedding_fn(sig: AudioSignal, sr: int = 16000) -> np.ndarray:
    """Per-frame log-mel embeddings (frames x 64), VGGish-like framing:
    16 kHz, 64 mels, ~1 s windows of stacked 25 ms frames."""
    sig = sig.clone().resample(sr).to_mono()
    mel = log_mel_spectrogram(sig.samples[0, 0], sr, n_fft=1024, hop=512, n_mels=64)
    return mel.T  # (frames, 64)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID/FAD formula: |mu1-mu2|^2 + Tr(c1 + c2 - 2 sqrt(c1 c2))."""
    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(cov1 @ cov2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1 + cov2 - 2.0 * covmean))


class FrechetAudioDistance:
    """Directory-to-directory FAD (reference eval.py:28-34,54 surface)."""

    def __init__(
        self,
        embedding_fn: Optional[Callable[[AudioSignal], np.ndarray]] = None,
        audio_ext: str = ".wav",
        verbose: bool = False,
    ):
        self.embedding_fn = embedding_fn or default_embedding_fn
        self.audio_ext = audio_ext
        self.verbose = verbose

    def _embeddings_for(self, files: List[Path]) -> np.ndarray:
        embs = []
        for f in files:
            sig = AudioSignal(f)
            embs.append(self.embedding_fn(sig))
        return np.concatenate(embs, axis=0)

    def _stats(self, embs: np.ndarray):
        mu = embs.mean(axis=0)
        cov = np.cov(embs, rowvar=False)
        return mu, np.atleast_2d(cov)

    def score(self, baseline_dir, eval_dir) -> float:
        b_files = sorted(Path(baseline_dir).glob(f"*{self.audio_ext}"))
        e_files = sorted(Path(eval_dir).glob(f"*{self.audio_ext}"))
        assert b_files and e_files, f"no audio in {baseline_dir} / {eval_dir}"
        mu1, cov1 = self._stats(self._embeddings_for(b_files))
        mu2, cov2 = self._stats(self._embeddings_for(e_files))
        return frechet_distance(mu1, cov1, mu2, cov2)

    def score_signals(self, baseline: List[AudioSignal], generated: List[AudioSignal]) -> float:
        mu1, cov1 = self._stats(
            np.concatenate([self.embedding_fn(s) for s in baseline], axis=0)
        )
        mu2, cov2 = self._stats(
            np.concatenate([self.embedding_fn(s) for s in generated], axis=0)
        )
        return frechet_distance(mu1, cov1, mu2, cov2)
