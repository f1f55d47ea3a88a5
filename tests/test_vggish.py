"""VGGish embedder: torchvggish-layout conversion parity + FAD plumbing."""
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.vggish import (
    FRAMES,
    N_MELS,
    VGGish,
    VGGishEmbedder,
    vggish_from_torch_checkpoint,
    waveform_to_examples,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


def _torch_vggish():
    """Mirror of the torchvggish module layout (features/embeddings)."""
    features = tnn.Sequential(
        tnn.Conv2d(1, 64, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
        tnn.Conv2d(256, 512, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(512, 512, 3, padding=1), tnn.ReLU(), tnn.MaxPool2d(2, 2),
    )
    embeddings = tnn.Sequential(
        tnn.Linear(512 * 4 * 6, 4096), tnn.ReLU(),
        tnn.Linear(4096, 4096), tnn.ReLU(),
        tnn.Linear(4096, 128), tnn.ReLU(),
    )
    model = tnn.Module()
    model.features = features
    model.embeddings = embeddings

    def forward(x):  # x (b, 1, 96, 64)
        y = features(x)
        y = y.permute(0, 2, 3, 1).contiguous().view(x.shape[0], -1)
        return embeddings(y)

    model.fwd = forward
    return model


@pytest.mark.slow
def test_vggish_conversion_parity(tmp_path):
    torch.manual_seed(0)
    tmodel = _torch_vggish().eval()
    # shrink init magnitude so deep ReLU stack stays in a sane range
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.3)
    path = tmp_path / "vggish.pth"
    torch.save(tmodel.state_dict(), path)

    params = vggish_from_torch_checkpoint(path)
    x = torch.randn(2, 1, FRAMES, N_MELS)
    with torch.no_grad():
        ref = tmodel.fwd(x).numpy()
    ours = np.asarray(
        VGGish().apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_waveform_to_examples_shapes():
    sr = 22050
    wav = np.random.default_rng(0).standard_normal(int(2.0 * sr)).astype(np.float32)
    ex = waveform_to_examples(wav, sr)
    # 2 s -> ~200 frames at 10 ms hop -> 2 full 96-frame examples
    assert ex.shape == (2, FRAMES, N_MELS)
    # short audio still yields one (padded) example
    ex1 = waveform_to_examples(wav[: sr // 2], sr)
    assert ex1.shape == (1, FRAMES, N_MELS)


@pytest.mark.slow
def test_vggish_embedder_in_fad(tmp_path):
    from vampnet_tpu.eval import FrechetAudioDistance

    torch.manual_seed(1)
    tmodel = _torch_vggish().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.3)
    path = tmp_path / "vggish.pth"
    torch.save(tmodel.state_dict(), path)

    emb = VGGishEmbedder(path)
    sr = 16000
    rng = np.random.default_rng(0)

    def sig(freq):
        t = np.arange(2 * sr) / sr
        w = (0.4 * np.sin(2 * np.pi * freq * t)
             + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        return AudioSignal(w[None, None, :], sr)

    e = emb(sig(220.0))
    assert e.shape[1] == 128 and e.shape[0] >= 1

    fad = FrechetAudioDistance(embedding_fn=emb)
    same = fad.score_signals([sig(220.0), sig(220.0)], [sig(220.0), sig(220.0)])
    diff = fad.score_signals([sig(220.0), sig(220.0)], [sig(1400.0), sig(1400.0)])
    assert diff > same
