"""Load the reference torch implementation (read-only at /root/reference) for
behavioral parity tests, stubbing its unavailable deps (loralib, audiotools).

This does NOT copy reference code into the repo — it imports the mounted
reference modules so our JAX implementation can be checked against actual
torch numerics (forward logits, filter math, bucket functions).
"""
from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference/vampnet"


def _stub_deps():
    if "loralib" not in sys.modules:
        import torch
        import torch.nn as nn

        loralib = types.ModuleType("loralib")

        class Linear(nn.Linear):
            def __init__(self, in_features, out_features, r=0, bias=True, **kw):
                super().__init__(in_features, out_features, bias=bias)
                self.r = r

        loralib.Linear = Linear
        loralib.mark_only_lora_as_trainable = lambda *a, **k: None
        loralib.lora_state_dict = lambda m: {}
        sys.modules["loralib"] = loralib

    if "audiotools" not in sys.modules:
        import torch.nn as nn

        at = types.ModuleType("audiotools")
        at_ml = types.ModuleType("audiotools.ml")
        at_util = types.ModuleType("audiotools.util")

        class BaseModel(nn.Module):
            pass

        at_ml.BaseModel = BaseModel
        at_util.seed = lambda *a, **k: None
        at.ml = at_ml
        at.util = at_util
        at.AudioSignal = object
        sys.modules["audiotools"] = at
        sys.modules["audiotools.ml"] = at_ml
        sys.modules["audiotools.util"] = at_util


def _load(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_transformer(ref_root: str = REF):
    """Returns the reference vampnet.modules.transformer module (torch).

    `ref_root` points at the reference's `vampnet/` package directory; the
    weight-day pipeline (scripts/convert_reference.py) passes its --reference
    flag through here for parity smoke + golden capture."""
    _stub_deps()
    if "refvamp.modules.transformer" in sys.modules:
        return sys.modules["refvamp.modules.transformer"]
    pkg = types.ModuleType("refvamp")
    pkg.__path__ = [ref_root]
    sys.modules["refvamp"] = pkg
    sub = types.ModuleType("refvamp.modules")
    sub.__path__ = [ref_root + "/modules"]
    sys.modules["refvamp.modules"] = sub
    _load("refvamp.util", ref_root + "/util.py")
    _load("refvamp.mask", ref_root + "/mask.py")
    _load("refvamp.modules.activations", ref_root + "/modules/activations.py")
    _load("refvamp.modules.layers", ref_root + "/modules/layers.py")
    return _load("refvamp.modules.transformer", ref_root + "/modules/transformer.py")
