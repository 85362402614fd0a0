"""Optax schedules/optimizers matching the reference's torch setup.

The reference uses StepLR(step_size=100, gamma=0.8) with a *conditional*
step — the scheduler only advances while lr > 1.5e-4
(inverse_img_w_mi.py:431-432,554-555) — which is a floored exponential
staircase; and plain StepLR for the first envmap loop (:227).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def step_lr(base_lr: float, step_size: int = 100, gamma: float = 0.8,
            floor: float = 0.0):
    """StepLR staircase with an optional lr floor."""
    def sched(count):
        lr = base_lr * gamma ** (count // step_size)
        if floor > 0:
            lr = jnp.maximum(lr, floor)
        return lr
    return sched


def _robust(tx):
    """NaN/Inf-proof wrapper: a non-finite MC gradient (possible at low
    spp) skips the update instead of permanently poisoning Adam state —
    torch Adam has no such failure mode visible in the reference because
    Mitsuba floors its emitter pdfs internally."""
    return optax.apply_if_finite(tx, max_consecutive_errors=10 ** 6)


def adam_steplr(lr: float, step_size: int = 100, gamma: float = 0.8,
                floor: float = 0.0):
    """Adam + StepLR (envmap phase, inverse_img_w_mi.py:226-227; direct
    material phase, :359-360)."""
    return _robust(optax.adam(step_lr(lr, step_size, gamma, floor)))


def adam_plain(lr: float):
    return _robust(optax.adam(lr))


def adamw_steplr(lr: float = 3e-4, step_size: int = 100, gamma: float = 0.8,
                 floor: float = 1.5e-4, weight_decay: float = 0.01):
    """AdamW + floored StepLR (pos_mlp material phase,
    inverse_img_w_mi.py:471-472 with the lr>1.5e-4 gate at :554-555)."""
    return _robust(optax.adamw(step_lr(lr, step_size, gamma, floor),
                               weight_decay=weight_decay))
