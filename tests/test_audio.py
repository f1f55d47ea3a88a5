"""Audio substrate tests (AudioSignal + loudness + beats)."""
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal, signal_concat
from vampnet_tpu.beats import DPBeatTracker, detect_onsets, Beats


def _tone(freq=440.0, seconds=1.0, sr=44100, amp=0.5):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    x = _tone()
    sig = AudioSignal(x[None, None, :], 44100)
    path = tmp_path / "t.wav"
    sig.write(path)
    sig2 = AudioSignal(path)
    assert sig2.sample_rate == 44100
    assert sig2.samples.shape == sig.samples.shape
    np.testing.assert_allclose(sig2.samples, sig.samples, atol=1e-3)


def test_resample():
    sig = AudioSignal(_tone(sr=44100)[None, None, :], 44100)
    sig.resample(16000)
    assert sig.sample_rate == 16000
    assert abs(sig.length - 16000) < 10


def test_to_mono():
    stereo = np.stack([_tone(440), _tone(880)], axis=0)[None]
    sig = AudioSignal(stereo, 44100).to_mono()
    assert sig.num_channels == 1


def test_loudness_normalize():
    sig = AudioSignal(_tone(amp=0.1)[None, None, :], 44100)
    sig.normalize(-24.0)
    measured = sig.clone().loudness()
    # re-measure from scratch
    fresh = AudioSignal(sig.samples.copy(), 44100).loudness()
    assert abs(fresh[0] - (-24.0)) < 1.0


def test_loudness_sine_reference():
    # a full-scale 1 kHz sine is ~ -3.01 LUFS per BS.1770
    sig = AudioSignal(_tone(freq=997.0, amp=1.0)[None, None, :], 48000)
    l = sig.loudness()[0]
    assert abs(l - (-3.0)) < 0.7


def test_ensure_max():
    sig = AudioSignal((_tone(amp=0.5) * 4)[None, None, :], 44100)
    sig.ensure_max_of_audio(1.0)
    assert np.abs(sig.samples).max() <= 1.0 + 1e-6


def test_concat_trim_pad():
    a = AudioSignal(_tone(seconds=0.5)[None, None, :], 44100)
    b = AudioSignal(_tone(seconds=0.25)[None, None, :], 44100)
    c = signal_concat([a, b])
    assert c.length == a.length + b.length
    c.trim(100, 50)
    assert c.length == a.length + b.length - 150
    c.zero_pad(10, 20)
    assert c.samples[0, 0, :10].sum() == 0


def test_detect_onsets_on_clicks():
    sr = 22050
    x = np.zeros(sr, dtype=np.float32)
    for pos in [2000, 8000, 14000, 20000]:
        x[pos : pos + 200] = _tone(880, 200 / sr, sr, amp=0.9)[:200]
    sig = AudioSignal(x[None, None, :], sr)
    onsets = detect_onsets(sig, hop_length=512)
    assert len(onsets) >= 3  # finds most clicks
    # onsets near the click frames
    expected = np.array([2000, 8000, 14000, 20000]) / 512
    for o in onsets:
        assert np.min(np.abs(expected - o)) < 6


def test_dp_beat_tracker_on_metronome():
    sr = 22050
    bpm = 120
    period = int(sr * 60 / bpm)
    x = np.zeros(sr * 4, dtype=np.float32)
    for pos in range(0, len(x) - 300, period):
        x[pos : pos + 300] = _tone(1000, 300 / sr, sr, amp=0.9)[:300]
    sig = AudioSignal(x[None, None, :], sr)
    beats, downbeats = DPBeatTracker(hop_length=512).extract_beats(sig)
    assert len(beats) >= 5
    intervals = np.diff(beats)
    # median interval ~ 0.5 s
    assert abs(np.median(intervals) - 0.5) < 0.06
    assert len(downbeats) >= 1


def test_beats_container_roundtrip(tmp_path):
    b = Beats(np.array([0.5, 1.0, 1.5]), np.array([0.5]))
    b.save(tmp_path)
    b2 = Beats.load(tmp_path)
    np.testing.assert_allclose(b.beat_times, b2.beat_times)
    sig = AudioSignal(np.zeros((1, 1, 44100), np.float32), 44100)
    segs = b.beat_segments(sig)
    assert len(segs) == 3 and abs(segs[-1].end - 1.0) < 1e-6


def test_time_stretch_length():
    from vampnet_tpu.audio.dsp import time_stretch

    x = _tone(440, seconds=1.0, sr=22050)
    y = time_stretch(x, 2.0)  # 2x faster -> ~half length
    assert abs(len(y) - len(x) / 2) < 2048
    y = time_stretch(x, 1.0)
    assert len(y) == len(x)


def test_pitch_shift_octave():
    from vampnet_tpu.audio.dsp import pitch_shift
    import scipy.signal

    sr = 22050
    sig = AudioSignal(_tone(440, seconds=1.0, sr=sr)[None, None, :], sr)
    shifted = pitch_shift(sig, 12)  # +1 octave
    assert shifted.length == sig.length  # duration preserved

    def peak_freq(x):
        f, p = scipy.signal.periodogram(x, sr)
        return f[np.argmax(p)]

    assert abs(peak_freq(sig.samples[0, 0]) - 440) < 15
    assert abs(peak_freq(shifted.samples[0, 0]) - 880) < 40

    # identity shift returns the same signal
    same = pitch_shift(sig, 0)
    np.testing.assert_array_equal(same.samples, sig.samples)
