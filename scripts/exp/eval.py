#!/usr/bin/env python
"""Offline eval harness (reference scripts/exp/eval.py): score each condition
directory against a baseline directory with FAD + mel loss, write CSV stats.

    python scripts/exp/eval.py --exp_dir samples/ --baseline_key baseline
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import pandas

from vampnet_tpu import config as cfglib
from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.eval import FrechetAudioDistance, mel_spectrogram_loss


def evaluate(exp_dir: str, baseline_key: str = "baseline", audio_ext: str = ".wav",
             vggish_ckpt: str = None):
    exp_dir = Path(exp_dir)
    assert exp_dir.exists(), f"exp_dir {exp_dir} does not exist"

    # with a torchvggish checkpoint the FAD is literature-comparable
    # (reference eval.py:28-34 uses pretrained VGGish); otherwise the
    # self-contained log-mel embedder gives self-consistent scores
    embedding_fn = None
    if vggish_ckpt:
        from vampnet_tpu.vggish import VGGishEmbedder

        embedding_fn = VGGishEmbedder(vggish_ckpt)
    frechet = FrechetAudioDistance(
        embedding_fn=embedding_fn, audio_ext=audio_ext, verbose=True
    )

    conditions = [d.name for d in exp_dir.iterdir() if d.is_dir()]
    assert baseline_key in conditions, f"baseline_key {baseline_key} not found in {exp_dir}"
    conditions.remove(baseline_key)
    print(f"Found {len(conditions)} conditions in {exp_dir}: {conditions}")

    baseline_dir = exp_dir / baseline_key
    baseline_files = sorted(baseline_dir.glob(f"*{audio_ext}"), key=lambda x: int(x.stem))

    metrics = []
    for condition in conditions:
        cond_dir = exp_dir / condition
        cond_files = sorted(cond_dir.glob(f"*{audio_ext}"), key=lambda x: int(x.stem))
        print(f"computing fad for {baseline_dir} and {cond_dir}")
        frechet_score = frechet.score(baseline_dir, cond_dir)

        num_files = min(len(baseline_files), len(cond_files))
        for b_file, c_file in zip(baseline_files[:num_files], cond_files[:num_files]):
            assert b_file.stem == c_file.stem, f"{b_file} vs {c_file} mismatch"
            b_sig = AudioSignal(b_file)
            c_sig = AudioSignal(c_file)
            c_sig.resample(b_sig.sample_rate)
            c_sig.samples = c_sig.samples[..., : b_sig.length]

            # inpainting conditions: trim the conditioning context off
            # (reference eval.py:74-79)
            if "inpaint" in condition:
                ctx_amt = float(condition.split("_")[-1])
                ctx = int(ctx_amt * b_sig.sample_rate)
                c_sig.trim(ctx, ctx)
                b_sig = AudioSignal(b_sig.samples.copy(), b_sig.sample_rate).trim(ctx, ctx)

            metrics.append(
                {
                    "mel": mel_spectrogram_loss(b_sig, c_sig),
                    "frechet": frechet_score,
                    "condition": condition,
                    "file": b_file.stem,
                }
            )

    metric_keys = [k for k in metrics[0] if k not in ("condition", "file")]
    for mk in metric_keys:
        stat = pandas.DataFrame(metrics).groupby(["condition"])[mk].agg(
            ["mean", "count", "std"]
        )
        stat.to_csv(exp_dir / f"stats-{mk}.csv")
    pandas.DataFrame(metrics).to_csv(exp_dir / "metrics-all.csv", index=False)
    return metrics


def main(argv=None):
    args = cfglib.parse_args(argv)
    return evaluate(
        exp_dir=args.get("exp_dir"),
        baseline_key=args.get("baseline_key", "baseline"),
        audio_ext=args.get("audio_ext", ".wav"),
        vggish_ckpt=args.get("vggish_ckpt"),
    )


if __name__ == "__main__":
    main()
