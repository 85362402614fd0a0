"""Stateless PRNG helpers for the Monte-Carlo estimator.

Replaces the reference's incidental RNG (np.random seed per render,
inverse_img_w_mi.py:62; Dr.Jit sampler) with jax.random key splitting —
one key per optimization step, folded into per-use streams, so every jitted
step is reproducible and shardable (keys can be split across the spp axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniforms(key, shape):
    """U[0,1) of the given shape."""
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def per_bounce_keys(key, max_depth: int, names=("lobe", "lobe_uv", "nee_uv")):
    """Split a step key into a {name: key} dict per bounce, statically."""
    out = []
    for b in range(max_depth):
        kb = jax.random.fold_in(key, b)
        ks = jax.random.split(kb, len(names))
        out.append(dict(zip(names, ks)))
    return out
