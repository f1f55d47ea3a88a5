"""Checkpoint save/load for LM and codec.

Two formats:
  * native `.vtpu` — msgpack of {"kind", "config", "params"} written by this
    framework (trainer/exporter). Fast, self-describing.
  * reference `.pth` — torch checkpoints (audiotools BaseModel layout or raw
    state dicts, reference scripts/exp/train.py:408-419); converted on load
    via vampnet_tpu.convert / codec.convert.

This is the inference-side story (reference vampnet/interface.py:27-50);
training checkpoints (optimizer/scheduler state, tags) live in
vampnet_tpu/train/checkpoints.py on orbax.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Optional, Tuple

import flax.serialization
import jax.numpy as jnp
import numpy as np

from .codec import CodecConfig
from .modules import LMConfig

MAGIC = b"VTPU1\n"


def _config_to_dict(cfg) -> dict:
    d = dataclasses.asdict(cfg)
    if d.get("ctrl_dims") is not None:
        d["ctrl_dims"] = [list(x) for x in d["ctrl_dims"]]
    return d


def _lm_config_from_dict(d: dict) -> LMConfig:
    if d.get("ctrl_dims") is not None:
        d["ctrl_dims"] = tuple((k, int(v)) for k, v in d["ctrl_dims"])
    return LMConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in d.items()})


def _to_host(tree):
    """Fetch a (possibly device-resident) pytree to host numpy in ONE
    overlapped transfer wave. Per-leaf synchronous `np.asarray` pays a full
    RPC round-trip per tensor on a remote-device link — measured ~80x
    slower than issuing every `copy_to_host_async` first (635 MB of coarse
    params: ~1,450 s naive vs 17.8 s overlapped, scratch/probe_fetch.py).
    Host-resident leaves pass through untouched."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for x in leaves:
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in leaves]
    )


def save_lm(path, config: LMConfig, params) -> None:
    payload = {
        "kind": "vampnet_lm",
        "config": json.dumps(_config_to_dict(config)),
        "params": flax.serialization.to_state_dict(_to_host(params)),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(flax.serialization.msgpack_serialize(payload))


def save_codec(path, config: CodecConfig, params) -> None:
    payload = {
        "kind": "vampnet_codec",
        "config": json.dumps(dataclasses.asdict(config)),
        "params": flax.serialization.to_state_dict(_to_host(params)),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(flax.serialization.msgpack_serialize(payload))


def _load_native(path) -> Optional[dict]:
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head != MAGIC:
            return None
        return flax.serialization.msgpack_restore(f.read())


def _to_jnp(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)


def load_lm(path, lora_path=None) -> Tuple[LMConfig, Any]:
    """Load an LM checkpoint (.vtpu native or .pth torch), optionally
    overlaying a LoRA-only checkpoint (reference interface.py:34-45:
    strict=False base load + adapter overlay)."""
    payload = _load_native(path)
    if payload is not None:
        assert payload["kind"] == "vampnet_lm", f"not an LM checkpoint: {path}"
        cfg = _lm_config_from_dict(json.loads(payload["config"]))
        params = _to_jnp(payload["params"])
    else:
        from .convert import lm_from_torch_checkpoint

        cfg, params = lm_from_torch_checkpoint(path)
    if lora_path is not None:
        params = _overlay_lora(params, lora_path)
    return cfg, params


def _overlay_lora(params, lora_path):
    from .modules.lora import merge_lora_state_dict

    payload = _load_native(lora_path)
    if payload is not None:
        lora_params = _to_jnp(payload["params"])
    else:
        from .convert import lora_from_torch_checkpoint

        lora_params = lora_from_torch_checkpoint(lora_path)
    return merge_lora_state_dict(params, lora_params)


def save_lora(path, lora_params) -> None:
    payload = {
        "kind": "vampnet_lora",
        "config": "{}",
        "params": flax.serialization.to_state_dict(_to_host(lora_params)),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(flax.serialization.msgpack_serialize(payload))


def save_wavebeat(path, config, params) -> None:
    """Native wavebeat (dsTCN) checkpoint: BN already folded at torch->flax
    conversion time, so this is the fully-baked inference tree."""
    payload = {
        "kind": "vampnet_wavebeat",
        "config": json.dumps(dataclasses.asdict(config)),
        "params": flax.serialization.to_state_dict(_to_host(params)),
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(flax.serialization.msgpack_serialize(payload))


def load_wavebeat(path):
    """Load a wavebeat checkpoint (.vtpu native or Lightning .pth/.ckpt)."""
    from .wavebeat import DsTCNBlockConfig, DsTCNConfig

    payload = _load_native(path)
    if payload is not None:
        assert payload["kind"] == "vampnet_wavebeat", f"not a wavebeat checkpoint: {path}"
        d = json.loads(payload["config"])
        cfg = DsTCNConfig(
            sample_rate=d["sample_rate"],
            noutputs=d["noutputs"],
            blocks=tuple(DsTCNBlockConfig(**b) for b in d["blocks"]),
        )
        return cfg, _to_jnp(payload["params"])
    from .wavebeat import dstcn_from_torch_checkpoint

    return dstcn_from_torch_checkpoint(path)


def load_codec(path) -> Tuple[CodecConfig, Any]:
    payload = _load_native(path)
    if payload is not None:
        assert payload["kind"] == "vampnet_codec", f"not a codec checkpoint: {path}"
        cfg = CodecConfig(
            **{
                k: tuple(v) if isinstance(v, list) else v
                for k, v in json.loads(payload["config"]).items()
            }
        )
        params = _to_jnp(payload["params"])
        return cfg, params
    from .codec.convert import codec_from_torch_checkpoint

    return codec_from_torch_checkpoint(path)
