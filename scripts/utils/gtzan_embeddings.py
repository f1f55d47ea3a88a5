#!/usr/bin/env python
"""Extract VampNet layer embeddings for a genre-labelled dataset (GTZAN-style
folder layout) for probing (reference scripts/utils/gtzan_embeddings.py).

    python scripts/utils/gtzan_embeddings.py --args.load configs/interface.yml \
        --path_to_gtzan data/gtzan/genres_original --output_dir gtzan-embs
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from vampnet_tpu import config as cfglib
from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.interface import Interface


def extract_embeddings(interface: Interface, path_to_gtzan: str, output_dir: str,
                       duration: float = 10.0, max_per_genre: int = 0,
                       layer: int = -1):
    """Mean-pooled transformer activations per excerpt -> npz + labels json."""
    import jax.numpy as jnp

    gtzan = Path(path_to_gtzan)
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    embs, labels = [], []
    lm = interface.coarse
    for genre_dir in sorted(d for d in gtzan.iterdir() if d.is_dir()):
        files = sorted(genre_dir.glob("*.wav")) + sorted(genre_dir.glob("*.au"))
        if max_per_genre:
            files = files[:max_per_genre]
        for f in files:
            sig = AudioSignal(f)
            want = int(duration * sig.sample_rate)
            sig.samples = sig.samples[..., :want]
            codes = interface.encode(sig)[:, : lm.n_codebooks, :]
            codebooks = interface._codebooks[: lm.n_codebooks]
            _, acts = lm.model.apply(
                {"params": lm.params},
                lm.model.bind({"params": lm.params}).from_codes(codes, codebooks),
                deterministic=True,
                return_activations=True,
            )
            emb = np.asarray(acts[layer].mean(axis=1))[0]  # (d_model,)
            embs.append(emb)
            labels.append(genre_dir.name)

    embs = np.stack(embs)
    np.savez(output_dir / "embeddings.npz", embeddings=embs)
    (output_dir / "labels.json").write_text(json.dumps(labels))
    print(f"wrote {len(labels)} embeddings ({embs.shape}) to {output_dir}")
    return embs, labels


def main(argv=None):
    args = cfglib.parse_args(argv)
    interface = Interface(
        coarse_ckpt=args.get("Interface.coarse_ckpt"),
        coarse2fine_ckpt=args.get("Interface.coarse2fine_ckpt"),
        codec_ckpt=args.get("Interface.codec_ckpt"),
    )
    return extract_embeddings(
        interface,
        path_to_gtzan=args["path_to_gtzan"],
        output_dir=args.get("output_dir", "gtzan-embs"),
        duration=float(args.get("duration", 10.0)),
        max_per_genre=int(args.get("max_per_genre", 0)),
    )


if __name__ == "__main__":
    main()
