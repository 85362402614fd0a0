"""MXU-based table lookup (one-hot matmul gather) — Pallas TPU kernel.

XLA's general gather on TPU costs ~8 ns/element (~16 ms for 2M lookups
from a 1 MB table — it scalarizes), which made screen-space ray marching
gather-bound. This kernel reformulates `table[v, u]` with queries living
in the *lane* dimension end-to-end (no vector reshapes/transposes, which
Mosaic cannot lower):

    voh (H, T)  = iota_H == v            one-hot of the row index
    C  (CW, T)  = tableᵀ (CW, H) @ voh   MXU: column t = table row v_t
    out (c, T)  = Σ_w C[cW+w, t]·(iota_W == u)   VPU select-reduce

The hi/lo bf16 split keeps ~f32 table accuracy (the one-hot is an exact
0/1 selector; only the table rounds): two cheap MXU passes.

Falls back to plain indexing off-TPU so CPU tests run the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, hi_ref, lo_ref, out_ref, *, height, width, channels,
            tile):
    idx = idx_ref[0, :]                              # (T,) int32 lanes
    idx2 = idx_ref[:]                                # (1, T)
    v = idx2 // width                                # (1, T)
    u = idx2 - v * width
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (height, tile), 0)
    voh = (rows_iota == v).astype(jnp.bfloat16)      # (H, T)
    cmat = jnp.dot(hi_ref[:], voh, preferred_element_type=jnp.float32)
    cmat = cmat + jnp.dot(lo_ref[:], voh,
                          preferred_element_type=jnp.float32)  # (CW, T)
    cols_iota = jax.lax.broadcasted_iota(jnp.int32, (width, tile), 0)
    uoh = (cols_iota == u).astype(jnp.float32)       # (W, T)
    for c in range(channels):
        block = cmat[c * width:(c + 1) * width, :]
        out_ref[c:c + 1, :] = jnp.sum(block * uoh, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile",))
def _onehot_gather_tpu(table, idx_flat, tile: int):
    if table.ndim == 2:
        h, w = table.shape
        c = 1
        blocked = table[None]                        # (1, H, W)
    else:
        h, w, c = table.shape
        blocked = jnp.transpose(table, (2, 0, 1))    # (C, H, W)
    # tableᵀ in channel-blocked layout: (C·W, H)
    t_t = jnp.transpose(blocked, (0, 2, 1)).reshape(c * w, h)
    # hi/lo split via mantissa masking: --xla_allow_excess_precision (set
    # by this environment's compile service) elides the naive
    # `x - f32(bf16(x))`, so mask the low mantissa bits explicitly.
    hi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(t_t, jnp.uint32)
        & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (t_t - hi_f32).astype(jnp.bfloat16)

    m = idx_flat.shape[0]
    pad = (-m) % tile
    idx_p = jnp.pad(idx_flat, (0, pad)).reshape(-1, 1, tile)
    n_tiles = idx_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, height=h, width=w, channels=c,
                          tile=tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, 1, tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c * w, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c * w, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, c, tile), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, c, tile), jnp.float32),
    )(idx_p, hi, lo)
    out = jnp.moveaxis(out, 1, 2).reshape(-1, c)[:m]  # (M, C)
    return out[:, 0] if table.ndim == 2 else out


def onehot_gather(table, idx, tile: int = 1024):
    """table (H, W) or (H, W, C) float32; idx (...,) int32 flat = v·W + u.

    Returns float32 (...,) or (..., C). Not differentiable — use for
    geometry lookups under stop_gradient (material gathers keep XLA's
    gather, which has a scatter-add adjoint)."""
    if jax.default_backend() != "tpu":
        flat = table.reshape((-1,) + table.shape[2:])
        return flat[idx]
    shape = idx.shape
    out = _onehot_gather_tpu(table, idx.reshape(-1), tile=tile)
    return out.reshape(shape + table.shape[2:])
