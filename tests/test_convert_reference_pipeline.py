"""Rehearse the ENTIRE weight-day command on synthetic reference checkpoints:
files-on-disk snapshot -> scripts/convert_reference.py -> native .vtpu zoo ->
Interface.default() vamps.

Weight day then is just `python scripts/convert_reference.py <snapshot>`
(VERDICT r2 item 2). Full-SHAPE converter rehearsal lives in
tests/test_convert_fullscale.py; this exercises the orchestration: discovery,
every converter, parity smoke, deterministic reference goldens, report,
registry preference for the converted files.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vampnet_tpu.codec import CodecConfig  # noqa: E402

CODEC_CFG = CodecConfig(
    sample_rate=16000, encoder_dim=8, encoder_rates=(2, 4),
    decoder_dim=32, decoder_rates=(4, 2), n_codebooks=6,
    codebook_size=32, codebook_dim=4,
)
LM_KW = dict(
    n_heads=2, n_layers=2, latent_dim=4, embedding_dim=32, vocab_size=32,
    dropout=0.0,
)


def _build_snapshot(root):
    """Reference-hub layout: codec.pth, coarse.pth, c2f.pth, wavebeat.pth,
    loras/<name>/{coarse,c2f}.pth (reference vampnet/__init__.py:20-77)."""
    from tests.reference_harness import load_reference_transformer
    from tests.test_codec_convert import TCodec
    from tests.test_wavebeat import HP, TDsTCN

    root.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)
    tcodec = TCodec(CODEC_CFG).eval()
    torch.save(
        {"state_dict": tcodec.state_dict(),
         "metadata": {"kwargs": {"sample_rate": CODEC_CFG.sample_rate}}},
        root / "codec.pth",
    )

    mod = load_reference_transformer()

    def save_lm(path, **kw):
        torch.manual_seed(sum(kw.values()) % 997)
        ref = mod.VampNet(flash_attn=False, **LM_KW, **kw).eval()
        torch.save(
            {"state_dict": ref.state_dict(),
             "metadata": {"kwargs": dict(LM_KW, **kw)}},
            path,
        )

    save_lm(root / "coarse.pth", n_codebooks=2, n_conditioning_codebooks=0)
    save_lm(root / "c2f.pth", n_codebooks=6, n_conditioning_codebooks=2)

    torch.manual_seed(3)
    torch.save(
        {"state_dict": TDsTCN(HP).eval().state_dict(), "hyper_parameters": HP},
        root / "wavebeat.pth",
    )

    lora_dir = root / "loras" / "myfinetune"
    lora_dir.mkdir(parents=True)
    save_lm(lora_dir / "coarse.pth", n_codebooks=2, n_conditioning_codebooks=0)
    save_lm(lora_dir / "c2f.pth", n_codebooks=6, n_conditioning_codebooks=2)
    return root


def test_hello_quickstart_runs_on_converted_zoo(tmp_path, monkeypatch):
    """Drive hello.py's main() — the README quickstart (reference
    hello.py:1-48) — end to end against a converted local zoo: encode ->
    build_mask(periodic, upper_codebook_mask) -> vamp -> decode -> write."""
    from scripts.convert_reference import convert_reference

    snap = _build_snapshot(tmp_path / "snapshot")
    out_dir = convert_reference(
        str(snap), out=str(tmp_path / "zoo"), parity=False, goldens=False
    )

    import vampnet_tpu.interface as iface_mod
    import vampnet_tpu.registry as registry

    monkeypatch.setattr(registry, "MODELS_DIR", out_dir)
    monkeypatch.setattr(iface_mod, "MODELS_DIR", out_dir, raising=False)

    import hello
    from vampnet_tpu.audio import AudioSignal

    # tiny codec => 2 kHz frame rate; shrink the chunk grid to match
    iface = iface_mod.Interface.default()
    iface.set_chunk_size(0.016)
    iface.c2f.chunk_size_s = 0.008

    sr = CODEC_CFG.sample_rate
    x = (0.2 * np.sin(2 * np.pi * 220 * np.arange(CODEC_CFG.hop_length * 32) / sr))
    AudioSignal(x[None, None, :].astype(np.float32), sr).write(
        tmp_path / "asset.wav"
    )

    sig = hello.main(
        asset=str(tmp_path / "asset.wav"), out=str(tmp_path / "hello_out.wav"),
        model="myfinetune", periodic_prompt=3, upper_codebook_mask=2,
        interface=iface, _sampling_steps=2,
    )
    assert (tmp_path / "hello_out.wav").exists()
    assert np.isfinite(np.asarray(sig.samples)).all()
    # the finetuned checkpoints got hot-swapped in
    assert iface.coarse_path == out_dir / "loras" / "myfinetune" / "coarse.vtpu"


def test_convert_reference_end_to_end(tmp_path, monkeypatch):
    from scripts.convert_reference import convert_reference

    snap = _build_snapshot(tmp_path / "snapshot")
    out = tmp_path / "zoo"

    out_dir = convert_reference(
        str(snap), out=str(out), reference="/root/reference/vampnet",
        parity=True, goldens=True, steps=4, seq=16,
    )

    for f in ("codec.vtpu", "coarse.vtpu", "c2f.vtpu", "wavebeat.vtpu",
              "loras/myfinetune/coarse.vtpu", "loras/myfinetune/c2f.vtpu",
              "CONVERSION_REPORT.md", "goldens/coarse.npz", "goldens/c2f.npz",
              # variant goldens pin the loop beyond the base regime
              # (VERDICT r4 item 4: coarse knobs + c2f typical/batch)
              "goldens/coarse__topp.npz", "goldens/coarse__cfg_g1.npz",
              "goldens/coarse__batch2.npz", "goldens/c2f__typical.npz",
              "goldens/c2f__batch2.npz"):
        assert (out_dir / f).exists(), f"missing {f}"

    report = (out_dir / "CONVERSION_REPORT.md").read_text()
    assert "EXACT MATCH" in report and "MISMATCH" not in report
    assert "logits corr=" in report

    # goldens carry the reference token stream and ours, equal by assertion
    g = np.load(out_dir / "goldens" / "coarse.npz")
    np.testing.assert_array_equal(g["ref_tokens"], g["ours"])
    assert g["ref_tokens"].shape[1] == 2  # coarse codebooks

    # the converted zoo IS the model dir: registry prefers .vtpu, so
    # Interface.default() loads natively with no torch and no network
    import vampnet_tpu.interface as iface_mod
    import vampnet_tpu.registry as registry

    monkeypatch.setattr(registry, "MODELS_DIR", out_dir)
    monkeypatch.setattr(iface_mod, "MODELS_DIR", out_dir, raising=False)
    iface = iface_mod.Interface.default()
    assert iface.coarse_path.suffix == ".vtpu"
    assert iface.beat_tracker is not None

    # finetune discovery + hot-swap over the converted loras
    assert "myfinetune" in iface.available_models()
    iface.load_finetuned("myfinetune")
    assert iface.coarse_path == out_dir / "loras" / "myfinetune" / "coarse.vtpu"

    # and it vamps: tokens in, tokens out through both stages (tiny chunks —
    # this codec's frame rate is 2 kHz, the default 10 s chunk would be huge)
    from vampnet_tpu.audio import AudioSignal

    iface.set_chunk_size(0.016)  # 32 tokens
    iface.c2f.chunk_size_s = 0.008  # 16 tokens
    x = (0.2 * np.sin(2 * np.pi * 220 * np.arange(CODEC_CFG.hop_length * 32)
                      / CODEC_CFG.sample_rate)).astype(np.float32)
    z = iface.encode(AudioSignal(x[None, None, :], CODEC_CFG.sample_rate))
    m = iface.build_mask(z, seed=0)
    zv = iface.vamp(z, m, seed=1, _sampling_steps=2)
    assert zv.shape == z.shape
    assert np.isfinite(np.asarray(iface.decode(zv).samples)).all()
