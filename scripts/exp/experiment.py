#!/usr/bin/env python
"""Generation-condition experiment grids (reference scripts/exp/experiment.py):
compression sweeps, sampling-step sweeps, beat-mask/inpaint conditions — the
sample generator feeding scripts/exp/eval.py.

    python scripts/exp/experiment.py --args.load configs/interface.yml \
        --sources data/val --exp_type gen-compression --output_dir samples/
"""
from __future__ import annotations

import random
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from vampnet_tpu import config as cfglib
from vampnet_tpu import mask as pmask
from vampnet_tpu.interface import Interface


def calculate_bitrate(interface, num_codebooks, downsample_factor):
    bit_width = 10
    sr = interface.codec_config.sample_rate
    hop = interface.codec_config.hop_length
    return (sr / hop) * ((bit_width * num_codebooks) / downsample_factor)


def baseline(sig, interface):
    return interface._preprocess(sig)


def reconstructed(sig, interface):
    return interface.decode(interface.encode(sig))


def coarse2fine(sig, interface):
    z = interface.encode(sig)
    z = z[:, : interface.c2f.n_conditioning_codebooks, :]
    z = interface.coarse_to_fine(z)
    return interface.decode(z)


class CoarseCond:
    """Keep n conditioning codebooks downsampled by x (reference :44-58)."""

    def __init__(self, num_conditioning_codebooks, downsample_factor):
        self.num_conditioning_codebooks = num_conditioning_codebooks
        self.downsample_factor = downsample_factor

    def __call__(self, sig, interface):
        z = interface.encode(sig)
        mask = pmask.full_mask(z)
        mask = pmask.codebook_unmask(mask, self.num_conditioning_codebooks)
        mask = pmask.mask_and(mask, pmask.periodic_mask(z, self.downsample_factor))
        zv = interface.coarse_vamp(z, mask)
        zv = interface.coarse_to_fine(zv)
        return interface.decode(zv)


def opus(sig, interface, bitrate=128):
    """ffmpeg opus round-trip baseline (reference :60-89)."""
    sig = interface._preprocess(sig)
    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        sig.write(f.name)
        opus_name = Path(f.name).with_suffix(".opus")
        subprocess.run(
            ["ffmpeg", "-y", "-i", f.name, "-c:a", "libopus", "-b:a", f"{bitrate}", opus_name],
            check=True, capture_output=True,
        )
        output_name = Path(f"{f.name}-opus").with_suffix(".wav")
        subprocess.run(["ffmpeg", "-y", "-i", opus_name, output_name],
                       check=True, capture_output=True)
        from vampnet_tpu.audio import AudioSignal

        return AudioSignal(output_name)


def mask_ratio_1_step(ratio=1.0):
    def wrapper(sig, interface):
        z = interface.encode(sig)
        mask = pmask.linear_random(jax.random.PRNGKey(0), z, ratio)
        zv = interface.coarse_vamp(z, mask, _sampling_steps=1)
        return interface.decode(zv)

    return wrapper


def num_sampling_steps(num_steps=1):
    def wrapper(sig, interface):
        z = interface.encode(sig)
        mask = pmask.periodic_mask(z, 16)
        zv = interface.coarse_vamp(z, mask, _sampling_steps=num_steps)
        zv = interface.coarse_to_fine(zv)
        return interface.decode(zv)

    return wrapper


def beat_mask(ctx_time):
    def wrapper(sig, interface):
        bm = interface.make_beat_mask(
            sig, before_beat_s=ctx_time / 2, after_beat_s=ctx_time / 2, invert=True
        )
        z = interface.encode(sig)
        zv = interface.coarse_vamp(z, bm[:, : z.shape[1], : z.shape[-1]])
        zv = interface.coarse_to_fine(zv)
        return interface.decode(zv)

    return wrapper


def inpaint(ctx_time):
    def wrapper(sig, interface):
        z = interface.encode(sig)
        mask = pmask.inpaint(z, interface.s2t(ctx_time), interface.s2t(ctx_time))
        zv = interface.coarse_vamp(z, mask)
        zv = interface.coarse_to_fine(zv)
        return interface.decode(zv)

    return wrapper


def token_noise(noise_amt):
    def wrapper(sig, interface):
        z = interface.encode(sig)
        key = jax.random.PRNGKey(0)
        mask = pmask.random(key, z, noise_amt)
        noise = jax.random.randint(key, z.shape, 0, interface.coarse.config.vocab_size)
        z = jnp.where(mask.astype(bool), noise, z)
        return interface.decode(z)

    return wrapper


EXP_REGISTRY = {}

EXP_REGISTRY["gen-compression"] = {
    "baseline": baseline,
    "reconstructed": reconstructed,
    "coarse2fine": coarse2fine,
    **{
        f"{n}_codebooks_downsampled_{x}x": CoarseCond(n, x)
        for (n, x) in ((1, 1), (4, 4), (4, 16), (4, 32))
    },
    **{f"token_noise_{x}": mask_ratio_1_step(ratio=x) for x in [0.25, 0.5, 0.75]},
}

EXP_REGISTRY["sampling-steps"] = {
    **{f"steps_{n}": num_sampling_steps(n) for n in [1, 4, 12, 36, 64, 72]},
}

EXP_REGISTRY["musical-sampling"] = {
    **{f"beat_mask_{t}": beat_mask(t) for t in [0.075]},
    **{f"inpaint_{t}": inpaint(t) for t in [0.5, 1.0]},
}


def main(argv=None, interface=None):
    args = cfglib.parse_args(argv)
    sources = args.get("sources", ["data/val"])
    if isinstance(sources, str):
        sources = [sources]
    output_dir = Path(args.get("output_dir", "./samples"))
    max_excerpts = int(args.get("max_excerpts", 2000))
    exp_type = args.get("exp_type", "gen-compression")
    seed = int(args.get("seed", 0))

    if interface is None:
        interface = Interface(
            coarse_ckpt=args.get("Interface.coarse_ckpt"),
            coarse2fine_ckpt=args.get("Interface.coarse2fine_ckpt"),
            codec_ckpt=args.get("Interface.codec_ckpt"),
            wavebeat_ckpt=args.get("Interface.wavebeat_ckpt"),
        )

    output_dir.mkdir(exist_ok=True, parents=True)
    from vampnet_tpu.train.datasets import AudioDataset, AudioLoader

    loader = AudioLoader(sources=sources)
    dataset = AudioDataset(
        loader,
        sample_rate=interface.codec_config.sample_rate,
        duration=interface.coarse.chunk_size_s,
        n_examples=max_excerpts,
        without_replacement=True,
        loudness_cutoff=-60.0,
    )

    if exp_type not in EXP_REGISTRY:
        raise ValueError(f"Unknown exp_type {exp_type}")
    conds = EXP_REGISTRY[exp_type]

    indices = list(range(min(max_excerpts, len(loader))))
    random.Random(seed).shuffle(indices)
    for i in indices:
        if all((output_dir / name / f"{i}.wav").exists() for name in conds):
            continue
        sig = dataset[i]["signal"]
        for name, cond in conds.items():
            o_dir = output_dir / name
            o_dir.mkdir(exist_ok=True, parents=True)
            out = cond(sig, interface)
            out.write(o_dir / f"{i}.wav")
    return output_dir


if __name__ == "__main__":
    main()
