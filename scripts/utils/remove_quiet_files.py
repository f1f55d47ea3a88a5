#!/usr/bin/env python
"""Copy a dataset, dropping files quieter than a loudness cutoff
(reference scripts/utils/remove_quiet_files.py).

    python scripts/utils/remove_quiet_files.py --src_dir in/ --dest_dir out/ --min_loudness -30
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from vampnet_tpu import config as cfglib
from vampnet_tpu.audio import AudioSignal
from vampnet_tpu.train.datasets import find_audio


def remove_quiet_files(src_dir, dest_dir, min_loudness: float = -30):
    src_dir, dest_dir = Path(src_dir), Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    shutil.copytree(src_dir, dest_dir, dirs_exist_ok=True)

    removed = 0
    for audio_file in find_audio([str(dest_dir)]):
        sig = AudioSignal(audio_file)
        if float(sig.loudness()[0]) < min_loudness:
            audio_file.unlink()
            removed += 1
            print(f"removed {audio_file}")
    print(f"removed {removed} quiet files")
    return dest_dir


if __name__ == "__main__":
    args = cfglib.parse_args()
    remove_quiet_files(
        src_dir=args["src_dir"], dest_dir=args["dest_dir"],
        min_loudness=float(args.get("min_loudness", -30)),
    )
