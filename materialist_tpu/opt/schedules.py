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
    """StepLR staircase with the reference's *gated* floor semantics.

    The reference steps the scheduler only while the current lr is above
    the gate (`if current_lr > 1.5e-4: scheduler.step()`), so the
    staircase FREEZES at the first value at-or-below the gate — e.g.
    3e-4·0.8⁴ = 1.2288e-4, NOT the gate value itself. A max(lr, floor)
    clamp (the r≤4 behavior) rests 22% hotter (1.5e-4) forever; the r4
    full-budget divergence made every tail-lr discrepancy suspect, so
    this now reproduces the torch trajectory exactly."""
    if floor > 0:
        k_freeze = 0
        while base_lr * gamma ** k_freeze > floor:
            k_freeze += 1
    else:
        k_freeze = None

    def sched(count):
        k = count // step_size
        if k_freeze is not None:
            k = jnp.minimum(k, k_freeze)
        return base_lr * gamma ** k
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
