"""Eval harness + experiment registry + utility scripts tests."""
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.eval import (
    FrechetAudioDistance,
    frechet_distance,
    mel_filterbank,
    mel_spectrogram_loss,
)


def _tone(freq, seconds=0.5, sr=22050, amp=0.5, noise=0.0, seed=0):
    t = np.arange(int(seconds * sr)) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * np.random.default_rng(seed).standard_normal(len(t))
    return AudioSignal(x.astype(np.float32)[None, None, :], sr)


def test_mel_filterbank_shapes():
    fb = mel_filterbank(22050, 1024, 40)
    assert fb.shape == (40, 513)
    assert (fb >= 0).all()
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_loss_discriminates():
    a = _tone(440)
    same = _tone(440)
    other = _tone(880)
    assert mel_spectrogram_loss(a, same) < 1e-6
    assert mel_spectrogram_loss(a, other) > 0.05


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 8))
    mu, cov = x.mean(0), np.cov(x, rowvar=False)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_fad_directories(tmp_path):
    base = tmp_path / "baseline"
    close = tmp_path / "close"
    far = tmp_path / "far"
    for d in (base, close, far):
        d.mkdir()
    for i in range(4):
        _tone(440 + 5 * i, noise=0.02, seed=i).write(base / f"{i}.wav")
        _tone(441 + 5 * i, noise=0.02, seed=10 + i).write(close / f"{i}.wav")
        _tone(3000 + 100 * i, noise=0.3, seed=20 + i).write(far / f"{i}.wav")
    fad = FrechetAudioDistance()
    d_close = fad.score(base, close)
    d_far = fad.score(base, far)
    assert d_close < d_far


def test_eval_cli(tmp_path):
    from scripts.exp.eval import evaluate

    base = tmp_path / "baseline"
    cond = tmp_path / "variation"
    base.mkdir(), cond.mkdir()
    for i in range(3):
        _tone(440, seed=i).write(base / f"{i}.wav")
        _tone(450, seed=i).write(cond / f"{i}.wav")
    metrics = evaluate(str(tmp_path))
    assert len(metrics) == 3
    assert (tmp_path / "stats-mel.csv").exists()
    assert (tmp_path / "stats-frechet.csv").exists()
    assert (tmp_path / "metrics-all.csv").exists()


def test_experiment_registry_contents():
    from scripts.exp.experiment import EXP_REGISTRY

    assert set(EXP_REGISTRY) == {"gen-compression", "sampling-steps", "musical-sampling"}
    gc = EXP_REGISTRY["gen-compression"]
    assert "baseline" in gc and "reconstructed" in gc and "coarse2fine" in gc
    assert "1_codebooks_downsampled_1x" in gc
    assert {f"steps_{n}" for n in [1, 4, 12, 36, 64, 72]} <= set(
        EXP_REGISTRY["sampling-steps"]
    )
    assert {"beat_mask_0.075", "inpaint_0.5", "inpaint_1.0"} <= set(
        EXP_REGISTRY["musical-sampling"]
    )


def test_fine_tune_conf_generation(tmp_path, monkeypatch):
    from scripts.exp.fine_tune import fine_tune

    conf_root = tmp_path / "configs"
    conf_root.mkdir()
    out = fine_tune(["my/audio"], "test-model", conf_root=str(conf_root))
    import yaml

    c2f = yaml.safe_load((out / "c2f.yml").read_text())
    assert c2f["VampNet.n_codebooks"] == 14
    assert c2f["train/AudioLoader.sources"] == ["my/audio"]
    assert c2f["$include"] == ["configs/lora/lora.yml"]
    coarse = yaml.safe_load((out / "coarse.yml").read_text())
    assert coarse["save_path"] == "./runs/test-model/coarse"
    iface = yaml.safe_load((out / "interface.yml").read_text())
    assert "Interface.coarse_ckpt" in iface


def test_export_copies_checkpoints(tmp_path, monkeypatch):
    import scripts.exp.export as export_mod

    monkeypatch.setattr(export_mod, "MODELS_DIR", tmp_path / "models")
    runs = tmp_path / "runs" / "m1"
    for model in ("coarse", "c2f"):
        d = runs / model / "latest"
        d.mkdir(parents=True)
        (d / "model.vtpu").write_bytes(b"x")
        (d / "lora.vtpu").write_bytes(b"y")
    out = export_mod.export("m1", runs_dir=str(tmp_path / "runs"))
    assert (out / "coarse.vtpu").exists() and (out / "c2f.lora.vtpu").exists()


def test_split_long_audio_file(tmp_path):
    from scripts.utils.split_long_audio_file import split_long_audio_file

    f = tmp_path / "long.wav"
    _tone(220, seconds=3.0).write(f)
    out = split_long_audio_file(str(f), max_chunk_size_s=1)
    wavs = list(out.glob("*.wav"))
    assert len(wavs) >= 4  # 3 s with 0.5 s hop


def test_remove_quiet_files(tmp_path):
    from scripts.utils.remove_quiet_files import remove_quiet_files

    src = tmp_path / "src"
    src.mkdir()
    _tone(440, amp=0.5).write(src / "loud.wav")
    _tone(440, amp=0.001).write(src / "quiet.wav")
    dest = remove_quiet_files(src, tmp_path / "dest", min_loudness=-40)
    assert (dest / "loud.wav").exists()
    assert not (dest / "quiet.wav").exists()


def test_train_test_split(tmp_path):
    from scripts.utils.split import train_test_split

    folder = tmp_path / "audio"
    folder.mkdir()
    for i in range(10):
        _tone(440 + i, seconds=0.1).write(folder / f"{i}.wav")
    train_test_split(str(folder), test_size=0.2, assume_yes=True)
    assert len(list((tmp_path / "audio-train").glob("*.wav"))) == 8
    assert len(list((tmp_path / "audio-test").glob("*.wav"))) == 2


def test_stage_snapshot(tmp_path):
    from scripts.utils.stage import run

    out = run(run_dir=str(tmp_path), name="snap1")
    assert out.exists()
    assert (out / "git-commit.txt").exists()
