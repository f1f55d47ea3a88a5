"""vampnet_tpu — a TPU-native (JAX/XLA/Pallas) masked acoustic-token
music-generation framework with the capabilities of hugofloresgarcia/vampnet.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  audio/     — host-side audio signal DSP substrate (L0)
  codec/     — DAC/LAC-style neural codec: conv+snake encoder/decoder + RVQ (L1)
  mask.py    — token/mask algebra (L2)
  modules/   — masked-transformer LM (L3)
  sampling/  — jitted MaskGIT iterative parallel decoding (L3)
  interface  — top-level encode/build_mask/vamp/decode orchestration (L4)
  train/     — training & fine-tuning stack (L5)
  serve/     — gradio app/API, unloop OSC client, token telephone (L6)
  beats.py, control.py — aux models (L7)
  parallel/  — device-mesh sharding (dp/tp + ZeRO-1 optimizer sharding)
  ops/       — Pallas TPU kernels for the hot paths
"""
from __future__ import annotations

__version__ = "0.1.0"

DEFAULT_MODEL = "default"
DEFAULT_HF_MODEL_REPO = "hugggof/vampnet"

from .registry import (  # noqa: F401,E402
    available_models,
    download_codec,
    download_default,
    download_finetuned,
    list_finetuned,
)
