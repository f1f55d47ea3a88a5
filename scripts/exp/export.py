#!/usr/bin/env python
"""Export fine-tuned models: copy run checkpoints into the local model zoo
layout and optionally upload to a HF repo (reference scripts/exp/export.py).

    python scripts/exp/export.py --name my-model [--tag latest] \
        [--repo_id user/repo --upload]
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from vampnet_tpu import config as cfglib
from vampnet_tpu.registry import MODELS_DIR


def export(name: str, tag: str = "latest", repo_id: str | None = None,
           upload: bool = False, runs_dir: str = "runs"):
    run_root = Path(runs_dir) / name
    out_dir = MODELS_DIR / "loras" / name
    out_dir.mkdir(parents=True, exist_ok=True)

    copied = []
    for model in ("coarse", "c2f"):
        src_dir = run_root / model / tag
        for fname in ("model.vtpu", "lora.vtpu"):
            src = src_dir / fname
            if src.exists():
                dst = out_dir / (f"{model}.vtpu" if fname == "model.vtpu" else f"{model}.lora.vtpu")
                shutil.copy(src, dst)
                copied.append(dst)
    assert copied, f"no checkpoints found under {run_root}/*/{tag}"
    print(f"exported {len(copied)} files to {out_dir}:")
    for c in copied:
        print(f"  {c}")

    if upload:  # pragma: no cover - network
        from huggingface_hub import HfApi

        api = HfApi()
        for path in copied:
            api.upload_file(
                path_or_fileobj=str(path),
                path_in_repo=f"loras/{name}/{path.name}",
                repo_id=repo_id,
            )
            print(f"uploaded {path.name} to {repo_id}")
    return out_dir


def main(argv=None):
    args = cfglib.parse_args(argv)
    return export(
        name=args["name"],
        tag=args.get("tag", "latest"),
        repo_id=args.get("repo_id"),
        upload=bool(args.get("upload", False)),
        runs_dir=args.get("runs_dir", "runs"),
    )


if __name__ == "__main__":
    main()
