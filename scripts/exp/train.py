#!/usr/bin/env python
"""Training CLI (reference scripts/exp/train.py):

    python scripts/exp/train.py --args.load configs/vampnet.yml \
        --save_path runs/my-run --codec_ckpt models/vampnet/codec.vtpu

Fine-tune (LoRA-only updates):

    python scripts/exp/train.py --args.load configs/lora/lora.yml \
        --init_ckpt models/vampnet/coarse.vtpu --save_path runs/my-finetune
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from vampnet_tpu.train.loop import main

if __name__ == "__main__":
    main()
