"""Config system tests (argbind-compatible YAML includes/scopes/CLI)."""
from pathlib import Path

import pytest

from vampnet_tpu import config as cfglib


def test_include_chain(tmp_path):
    (tmp_path / "base.yml").write_text("a: 1\nb: 2\nX.attr: 10\n")
    (tmp_path / "mid.yml").write_text(f"$include:\n  - {tmp_path}/base.yml\nb: 3\n")
    (tmp_path / "top.yml").write_text(f"$include:\n  - {tmp_path}/mid.yml\na: 9\n")
    cfg = cfglib.load_config(tmp_path / "top.yml")
    assert cfg == {"a": 9, "b": 3, "X.attr": 10}


def test_repo_lora_config_resolves():
    cfg = cfglib.load_config(Path(__file__).parent.parent / "configs" / "lora" / "lora.yml")
    # overlay wins over base
    assert cfg["fine_tune"] is True
    assert cfg["batch_size"] == 7  # lora.yml override
    assert cfg["VampNet.n_layers"] == 20  # inherited from vampnet.yml
    assert cfg["AdamW.lr"] == 0.0001


def test_repo_s2s_config_resolves():
    cfg = cfglib.load_config(
        Path(__file__).parent.parent / "configs" / "lora" / "lora-s2s.yml"
    )
    assert cfg["Sketch2SoundController.ctrl_keys"] == ["rmsq16"]
    assert cfg["fine_tune"] is True  # two-level include chain


def test_parse_args_load_and_overrides(tmp_path):
    (tmp_path / "c.yml").write_text("batch_size: 4\nVampNet.n_layers: 2\n")
    args = cfglib.parse_args([
        "--args.load", str(tmp_path / "c.yml"),
        "--VampNet.n_layers", "5",
        "--save_path", "runs/x",
        "--save_iters", "10", "20",
        "--flag",
    ])
    assert args["batch_size"] == 4
    assert args["VampNet.n_layers"] == 5  # CLI wins
    assert args["save_path"] == "runs/x"
    assert args["save_iters"] == [10, 20]
    assert args["flag"] is True


def test_scope_shadowing():
    args = {"AudioDataset.duration": 10.0, "train/AudioDataset.duration": 3.0}
    assert cfglib.bound(args, "AudioDataset", "duration") == 10.0
    with cfglib.scope(args, "train"):
        assert cfglib.bound(args, "AudioDataset", "duration") == 3.0
    assert cfglib.bound(args, "AudioDataset", "duration") == 10.0


def test_bind_kwargs_scoped():
    args = {
        "AudioLoader.sources": ["a"],
        "train/AudioLoader.sources": ["b"],
        "AudioLoader.shuffle": False,
    }
    with cfglib.scope(args, "train"):
        kw = cfglib.bind_kwargs(args, "AudioLoader", sources=[], shuffle=True)
    assert kw["sources"] == ["b"]
    assert kw["shuffle"] is False


def test_generate_and_dump(tmp_path):
    cfglib.generate_conf(
        tmp_path / "g.yml", include=["base.yml"], overrides={"x": 1}
    )
    text = (tmp_path / "g.yml").read_text()
    assert "$include" in text and "x: 1" in text
    cfglib.dump_args({"a": 1}, tmp_path / "args.yml")
    assert "a: 1" in (tmp_path / "args.yml").read_text()
