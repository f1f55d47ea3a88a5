"""Noam LR schedule (reference vampnet/scheduler.py:6-47) as an optax schedule:
lr(step) = factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5).
"""
from __future__ import annotations

import jax.numpy as jnp


def noam_schedule(d_model: int, factor: float = 1.0, warmup: int = 4000):
    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) if hasattr(step, "astype") else float(step), 1.0)
        return factor * (d_model ** -0.5) * jnp.minimum(s ** -0.5, s * warmup ** -1.5)

    return schedule
