"""Model registry: HF Hub download of codec/coarse/c2f/wavebeat checkpoints and
LoRA finetunes, plus local model discovery.

Mirrors reference vampnet/__init__.py:20-77. Checkpoints here are either
native orbax/msgpack trees (produced by our trainer/exporter) or original
torch `.pth` files, which `vampnet_tpu.codec.convert` / `modules.convert`
translate into JAX parameter trees on load. Network access is lazy: local
files always win, and a missing network yields a clear error instead of an
import-time failure.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Tuple

ROOT = Path(__file__).parent.parent
MODELS_DIR = Path(os.environ.get("VAMPNET_MODELS_DIR", ROOT / "models" / "vampnet"))


def _default_repo() -> str:
    from . import DEFAULT_HF_MODEL_REPO

    repo_file = ROOT / "DEFAULT_HF_MODEL_REPO"
    if repo_file.exists():
        return repo_file.read_text().strip()
    return DEFAULT_HF_MODEL_REPO


def _clean_download_residue(base: Path, filename: str) -> None:
    """Remove partial-download residue a failed/killed hf_hub_download leaves
    under `<base>/.cache/huggingface` (`*.lock` files and `*.incomplete`
    blobs). Harmless to loading — `local_path.exists()` only sees committed
    files — but stale locks can wedge a RETRY of the same download, which is
    exactly what weight day does after a transient network failure."""
    cache = base / ".cache" / "huggingface"
    if not cache.exists():
        return
    stem = Path(filename).name
    for pattern in (f"**/{stem}*.lock", f"**/{stem}*.incomplete"):
        for p in cache.glob(pattern):
            try:
                p.unlink()
            except OSError:
                pass


def _hub_download(repo_id: str, filename: str, local_path: Path) -> str:
    if local_path.exists():
        return str(local_path)
    # hf_hub_download preserves the full `filename` path under local_dir,
    # so local_dir must be the base that makes local_dir/filename equal
    # local_path (nested names like loras/<name>/coarse.pth included)
    base = Path(str(local_path)[: -len(filename)].rstrip("/"))
    try:
        from huggingface_hub import hf_hub_download

        local_path.parent.mkdir(parents=True, exist_ok=True)
        return hf_hub_download(repo_id=repo_id, filename=filename, local_dir=base)
    except Exception as e:
        _clean_download_residue(base, filename)
        raise FileNotFoundError(
            f"checkpoint {local_path} not found locally and hub download of "
            f"{repo_id}/{filename} failed: {e}"
        ) from e


def _prefer_native(local_pth: Path) -> Path | None:
    """Weight-day converted checkpoints (`scripts/convert_reference.py`) sit
    next to the torch originals as `.vtpu`; always load those when present
    (no torch dependency, no conversion cost on load)."""
    native = local_pth.with_suffix(".vtpu")
    return native if native.exists() else None


def download_codec(repo_id: str | None = None) -> str:
    native = _prefer_native(MODELS_DIR / "codec.pth")
    if native is not None:
        return str(native)
    repo_id = repo_id or _default_repo()
    return _hub_download(repo_id, "codec.pth", MODELS_DIR / "codec.pth")


def download_default(repo_id: str | None = None) -> Tuple[str, str]:
    paths = []
    for filename in ["coarse.pth", "c2f.pth", "wavebeat.pth"]:
        native = _prefer_native(MODELS_DIR / filename)
        if native is not None:
            paths.append(str(native))
            continue
        try:
            paths.append(
                _hub_download(repo_id or _default_repo(), filename, MODELS_DIR / filename)
            )
        except FileNotFoundError:
            if filename == "wavebeat.pth":  # optional, beat masks degrade gracefully
                paths.append(None)
            else:
                raise
    return paths[0], paths[1]


def download_finetuned(name: str, repo_id: str | None = None) -> Tuple[str, str]:
    paths = []
    for filename in ["coarse.pth", "c2f.pth"]:
        local = MODELS_DIR / "loras" / name / filename
        native = _prefer_native(local)
        if native is not None:
            paths.append(str(native))
            continue
        paths.append(
            _hub_download(repo_id or _default_repo(), f"loras/{name}/{filename}", local)
        )
    return paths[0], paths[1]


def list_finetuned(repo_id: str | None = None) -> List[str]:
    """List finetuned model names: local `models/vampnet/loras/*` dirs holding
    both coarse and c2f checkpoints, unioned with the hub listing when
    reachable (reference vampnet/__init__.py:62-77)."""
    names = set()
    loras = MODELS_DIR / "loras"
    if loras.exists():
        for d in loras.iterdir():
            files = {p.name for p in d.iterdir()} if d.is_dir() else set()
            if {"coarse.pth", "c2f.pth"} & files or {"coarse.vtpu", "c2f.vtpu"} & files:
                names.add(d.name)
    try:  # pragma: no cover - network-dependent
        from huggingface_hub import HfFileSystem

        fs = HfFileSystem()
        repo_id = repo_id or _default_repo()
        for item in fs.listdir(f"{repo_id}/loras"):
            item_names = [i["name"].split("/")[-1] for i in fs.listdir(item["name"])]
            if "c2f.pth" in item_names and "coarse.pth" in item_names:
                names.add(item["name"].split("/")[-1])
    except Exception:
        pass
    return sorted(names)


def available_models() -> List[str]:
    return list_finetuned() + ["default"]
