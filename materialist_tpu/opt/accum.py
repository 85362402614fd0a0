"""Exact gradient accumulation over sample groups (host-level).

The single-jit inverse step at 1024²×64 spp needs >20 GB of HBM: XLA
schedules every spp-chunk's (re)computation concurrently in the backward
no matter how the chunks are barriered. This utility splits the step into
per-group jit calls with bounded memory, EXACTLY:

    img       = mean_g render(params, key_g)           (forward-only jits)
    loss, ct  = value_and_grad(loss_of_img)(img)       (tiny jit)
    grads     = Σ_g vjp(render(·, key_g), params)(ct / G)

The mean is linear, so pulling the per-image cotangent ct/G back through
each group gives the exact gradient of loss(mean image) — at the cost of
rendering each group's forward twice (once for the mean, once inside its
vjp). Groups run as separate device executions; peak memory is one
group's forward+backward.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp


def make_accum_value_and_grad(render_fn: Callable, loss_of_img: Callable,
                              n_groups: int):
    """Build value_and_grad(params, key) for loss_of_img(mean render).

    render_fn(params, key) -> (H, W, 3) image (jit-compiled internally).
    loss_of_img(img) -> scalar loss (may close over the target).
    Returns fn(params, key) -> (loss, grads).
    """
    render_j = jax.jit(render_fn)
    loss_vg = jax.jit(jax.value_and_grad(loss_of_img))

    @jax.jit
    def group_vjp(params, key, ct):
        _, pull = jax.vjp(lambda p: render_fn(p, key), params)
        return pull(ct)[0]

    def value_and_grad(params, key):
        keys = jax.random.split(key, n_groups)
        img = None
        for g in range(n_groups):
            im = render_j(params, keys[g])
            img = im if img is None else img + im
        img = img / n_groups
        loss, ct = loss_vg(img)
        ct = ct / n_groups
        grads = None
        for g in range(n_groups):
            gg = group_vjp(params, keys[g], ct)
            grads = gg if grads is None else jax.tree.map(
                jnp.add, grads, gg)
        return loss, grads

    return value_and_grad
