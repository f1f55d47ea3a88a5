"""Visual debug harness for the sampler (reference transformer.py:785-816,
824-889: `generate(debug=True)` dumps per-step PNGs of mask/z/probs to
vampnet-debug/).

The loop runs on-device under jit, so dumps flow through
`jax.debug.callback`: pass `debug_callback=save_debug_dumps("vampnet-debug")`
to `generate(...)` and each step's state lands on the host as npz (+ PNGs
when matplotlib is available).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def save_debug_dumps(debug_dir: str = "vampnet-debug", save_png: bool = True):
    """Returns a callback(step, z_masked, sampled, mask, selected_probs,
    num_to_mask) for generate()."""
    root = Path(debug_dir)
    root.mkdir(parents=True, exist_ok=True)

    def callback(step, z_masked, sampled, mask, selected_probs, num_to_mask):
        step = int(step)
        step_dir = root / f"step_{step}"
        step_dir.mkdir(exist_ok=True)
        z_masked = np.asarray(z_masked)
        sampled = np.asarray(sampled)
        mask = np.asarray(mask)
        np.savez(
            step_dir / "state.npz", z_masked=z_masked, sampled=sampled, mask=mask,
            selected_probs=np.asarray(selected_probs),
            num_to_mask=np.asarray(num_to_mask),
        )
        if save_png:
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                for name, arr in (
                    ("z_masked", z_masked[0]),
                    ("mask", mask[0]),
                ):
                    plt.clf()
                    img = arr if arr.ndim == 2 else arr[None, :]
                    plt.imshow(img, aspect="auto", origin="lower", interpolation="none")
                    plt.savefig(step_dir / f"{name}.png", dpi=80)
            except Exception:
                pass

    return callback
