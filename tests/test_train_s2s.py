"""Sketch2sound training path: controller wiring, ctrl-conditioned LM, and
sample dumping in the training loop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.checkpoints import save_codec
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.train.loop import train

CODEC_CFG = CodecConfig(
    sample_rate=8000, encoder_dim=8, encoder_rates=(2, 4, 4),
    decoder_dim=64, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=32, codebook_dim=4,
)


@pytest.fixture(scope="module")
def data_and_codec(tmp_path_factory):
    root = tmp_path_factory.mktemp("s2s")
    from vampnet_tpu.audio import AudioSignal

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = root / split
        d.mkdir()
        for i in range(2):
            t = np.arange(8000) / 8000
            x = 0.4 * np.sin(2 * np.pi * (150 + 70 * i) * t) + 0.01 * rng.standard_normal(8000)
            AudioSignal(x.astype(np.float32)[None, None, :], 8000).write(d / f"{i}.wav")
    codec = LAC(CODEC_CFG)
    params = codec.init(jax.random.PRNGKey(0), jnp.zeros((1, CODEC_CFG.hop_length * 4, 1)))["params"]
    save_codec(root / "codec.vtpu", CODEC_CFG, params)
    return root


def test_s2s_training_and_samples(data_and_codec, tmp_path):
    root = data_and_codec
    save = tmp_path / "s2s-run"
    state = train(
        {
            "codec_ckpt": str(root / "codec.vtpu"),
            "save_path": str(save),
            "num_iters": 2,
            "batch_size": 2,
            "val_freq": 10,
            "sample_freq": 2,  # trigger sample dump on step 2
            "num_workers": 1,
            "VampNet.n_heads": 2,
            "VampNet.n_layers": 1,
            "VampNet.n_codebooks": 2,
            "VampNet.latent_dim": 4,
            "VampNet.embedding_dim": 32,
            "VampNet.vocab_size": 32,
            "NoamScheduler.warmup": 10,
            "Sketch2SoundController.ctrl_keys": ["rmsq16"],
            "train/AudioLoader.sources": [str(root / "train")],
            "val/AudioLoader.sources": [str(root / "val")],
            "AudioDataset.duration": 0.5,
            "AudioDataset.loudness_cutoff": -60.0,
            "train/AudioDataset.n_examples": 8,
            "val/AudioDataset.n_examples": 4,
        },
        seed=0,
    )
    assert int(state.step) == 2
    # control encoder params exist and were trained
    import flax.traverse_util as tu

    flat = tu.flatten_dict(jax.device_get(state.params))
    ctrl_keys = [k for k in flat if k[0] == "ctrl_encoder"]
    assert ctrl_keys, "ctrl_encoder params missing"
    # sample dumps written
    sample_dir = save / "samples" / "step_2"
    for name in ("reconstructed", "inpainted_prompt", "inpainted_middle"):
        wavs = list((sample_dir / name).glob("*.wav"))
        assert wavs, f"no samples for {name}"
