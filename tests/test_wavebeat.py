"""WaveBeat (dsTCN) port tests: torch-checkpoint conversion parity, peak
picking, and the end-to-end tracker/registry/make_beat_mask path."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.wavebeat import (
    DsTCN,
    DsTCNConfig,
    WaveBeatModel,
    dstcn_from_torch_checkpoint,
    pick_peaks,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


HP = dict(
    ninputs=1, noutputs=2, nblocks=3, kernel_size=15, stride=2,
    dilation_growth=8, dilation_cycle=2, channel_width=8, channel_growth=8,
    sample_rate=22050,
)


class TBlock(tnn.Module):
    """Mirror of the wavebeat dsTCNBlock layout the converter assumes:
    conv1 -> BatchNorm -> PReLU, strided 1x1 residual conv -> BatchNorm."""

    def __init__(self, in_ch, out_ch, k, stride, dilation):
        super().__init__()
        pad = ((k - 1) // 2) * dilation
        self.conv1 = tnn.Conv1d(in_ch, out_ch, k, stride=stride,
                                dilation=dilation, padding=pad, bias=False)
        self.norm1 = tnn.BatchNorm1d(out_ch)
        self.act1 = tnn.PReLU(out_ch)
        self.res_conv = tnn.Conv1d(in_ch, out_ch, 1, stride=stride, bias=False)
        self.res_norm = tnn.BatchNorm1d(out_ch)

    def forward(self, x):
        y = self.act1(self.norm1(self.conv1(x)))
        r = self.res_norm(self.res_conv(x))
        t = min(y.shape[-1], r.shape[-1])
        return y[..., :t] + r[..., :t]


class TDsTCN(tnn.Module):
    def __init__(self, hp):
        super().__init__()
        blocks, in_ch = [], hp["ninputs"]
        for n in range(hp["nblocks"]):
            out_ch = hp["channel_width"] if n == 0 else in_ch + hp["channel_growth"]
            dil = hp["dilation_growth"] ** (n % hp["dilation_cycle"])
            blocks.append(TBlock(in_ch, out_ch, hp["kernel_size"], hp["stride"], dil))
            in_ch = out_ch
        self.blocks = tnn.ModuleList(blocks)
        self.output = tnn.Conv1d(in_ch, hp["noutputs"], 1)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.output(x)


def _save_ckpt(tmp_path, tmodel, hp):
    path = tmp_path / "wavebeat.pth"
    torch.save({"state_dict": tmodel.state_dict(), "hyper_parameters": hp}, path)
    return path


def test_dstcn_conversion_forward_parity(tmp_path):
    torch.manual_seed(0)
    tmodel = TDsTCN(HP).eval()
    # randomize BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm1d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
    path = _save_ckpt(tmp_path, tmodel, HP)

    cfg, params = dstcn_from_torch_checkpoint(path)
    assert len(cfg.blocks) == 3
    assert cfg.blocks[1].dilation == 8 and cfg.blocks[2].dilation == 1
    assert cfg.total_stride == 8
    model = DsTCN(cfg)

    x = torch.randn(1, 1, 1024)
    with torch.no_grad():
        ref = tmodel(x).numpy()  # (1, 2, t')
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    ).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_pick_peaks():
    fps = 100.0
    act = np.zeros(500)
    for f in (50, 150, 250, 350, 450):
        act[f] = 0.9
        act[f - 1] = act[f + 1] = 0.6
    times = pick_peaks(act, fps, threshold=0.5, max_bpm=240.0)
    np.testing.assert_allclose(times, [0.5, 1.5, 2.5, 3.5, 4.5])
    # refractory distance suppresses doubled peaks
    act[51] = 0.95
    times = pick_peaks(act, fps, threshold=0.5, max_bpm=240.0)
    assert len(times) == 5


def _click_detector_ckpt(tmp_path, sr=22050):
    """Hand-built 1-block checkpoint that fires on click transients: the
    conv averages |x| energy (clicks are positive), the output conv applies
    gain so sigmoid crosses 0.5 only at clicks."""
    hp = dict(HP, nblocks=1, noutputs=2, channel_width=4, sample_rate=sr)
    tmodel = TDsTCN(hp).eval()
    with torch.no_grad():
        b = tmodel.blocks[0]
        b.conv1.weight.zero_()
        # two adjacent taps: stride-2 output sees both input phases
        b.conv1.weight[:, 0, 7] = 1.0
        b.conv1.weight[:, 0, 8] = 1.0
        b.norm1.running_mean.zero_()
        b.norm1.running_var.fill_(1.0)
        b.norm1.weight.fill_(1.0)
        b.norm1.bias.zero_()
        b.act1.weight.fill_(1.0)  # PReLU identity
        b.res_conv.weight.zero_()
        b.res_norm.running_mean.zero_()
        b.res_norm.running_var.fill_(1.0)
        b.res_norm.weight.fill_(1.0)
        b.res_norm.bias.zero_()
        tmodel.output.weight.fill_(5.0)
        tmodel.output.bias.fill_(-4.0)  # sigmoid(-4) ~ 0.018 at silence
    return _save_ckpt(tmp_path, tmodel, hp)


def test_wavebeat_model_finds_clicks(tmp_path):
    sr = 22050
    path = _click_detector_ckpt(tmp_path, sr)
    model = WaveBeatModel.from_checkpoint(path)
    assert model.config.frame_rate == sr / 2

    # ~120 BPM clicks, offset from 0 (find_peaks can't fire at index 0)
    dur, offset, period_samp = 4.0, 2000, 11024
    x = np.zeros(int(dur * sr), np.float32)
    click_t = [(offset + k * period_samp) / sr for k in range(8)]
    for t in click_t:
        x[int(t * sr)] = 1.0
    beats, downbeats = model.predict_beats_from_array(x, sr)
    assert len(beats) == 8
    np.testing.assert_allclose(beats, click_t, atol=0.01)


def test_wavebeat_tracker_and_beat_mask(tmp_path):
    """Registry + Interface.make_beat_mask coverage with a real (synthetic)
    checkpoint — VERDICT.md round-1 item 5."""
    from vampnet_tpu.beats import WaveBeat, load_beat_tracker

    sr = 22050
    path = _click_detector_ckpt(tmp_path, sr)
    tracker = load_beat_tracker("wavebeat", ckpt_path=str(path))
    assert isinstance(tracker, WaveBeat)
    assert tracker.model is not None, "must load the dsTCN, not the fallback"

    dur, offset, period_samp = 2.0, 2000, 11024
    x = np.zeros(int(dur * sr), np.float32)
    for k in range(4):
        x[offset + k * period_samp] = 1.0
    sig = AudioSignal(x[None, None, :], sr)
    beats, downbeats = tracker.extract_beats(sig)
    assert len(beats) == 4

    # fallback path still works when the checkpoint is junk
    bad = WaveBeat(ckpt_path=str(tmp_path / "missing.pth"))
    assert bad.model is None
    bt, _ = bad.extract_beats(sig)
    assert isinstance(bt, np.ndarray)
