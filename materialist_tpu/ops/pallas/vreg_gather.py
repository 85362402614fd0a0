"""Vreg-composed table lookup — the fast path for mip-sized tables.

Mosaic's `tpu.dynamic_gather` (what jnp.take_along_axis lowers to) only
shuffles within a single vreg: 8 sublanes along axis 0, 128 lanes along
axis 1. An arbitrary (v, u) lookup from an (8, 128) plane composes two of
them, processing 128 queries (one lane vector) per op pair:

    B[k, j]   = plane[k, u_j]      axis-1 gather, u broadcast over sublanes
    out[k, j] = B[v_j, j]          axis-0 gather, v broadcast — rows equal

Tables bigger than one plane are split into P = ceil(N/1024) planes with a
compare-select across planes: ~3P vreg ops per 128 queries, i.e. ~0.5 ms
for 2M lookups from a 128² table vs ~17 ms for the one-hot MXU kernel and
~16 ms for XLA's gather. Intended for the marcher's mip and fine tables
(≤256²); falls back to plain indexing off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PLANE = 1024  # 8 sublanes × 128 lanes


def _kernel(idx_ref, table_ref, out_ref, *, planes, rows):
    for g in range(rows):
        q = idx_ref[g:g + 1, :]                       # (1, 128) int32
        plane_id = q // _PLANE
        within = q - plane_id * _PLANE
        v = within // 128                             # (1, 128) in [0, 8)
        u = within - v * 128                          # (1, 128) in [0, 128)
        u_b = jnp.broadcast_to(u, (8, 128))
        v_b = jnp.broadcast_to(v, (8, 128))
        acc = jnp.zeros((1, 128), jnp.float32)
        for p in range(planes):
            plane = table_ref[8 * p:8 * p + 8, :]     # (8, 128)
            b = jnp.take_along_axis(plane, u_b, axis=1)
            val = jnp.take_along_axis(b, v_b, axis=0)[0:1, :]
            acc = jnp.where(plane_id == p, val, acc)
        out_ref[g:g + 1, :] = acc


@functools.partial(jax.jit, static_argnames=("rows",))
def _vreg_gather_tpu(table, idx_flat, rows: int = 16):
    h, w = table.shape
    n = h * w
    planes = -(-n // _PLANE)
    pad_n = planes * _PLANE - n
    flat = table.reshape(-1)
    if pad_n:
        flat = jnp.pad(flat, (0, pad_n))
    table_planes = flat.reshape(planes * 8, 128)

    m = idx_flat.shape[0]
    per_tile = rows * 128
    pad = (-m) % per_tile
    idx_p = jnp.pad(idx_flat, (0, pad)).reshape(-1, rows, 128)
    n_tiles = idx_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, planes=planes, rows=rows),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((None, rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows, 128), jnp.float32),
    )(idx_p, table_planes)
    return out.reshape(-1)[:m]


def vreg_gather(table, idx, rows: int = 16):
    """table (H, W) float32 with H·W ≤ ~64k; idx (...,) flat int32.

    Row-major flat indexing (= v·W + u). Not differentiable; use under
    stop_gradient for geometry lookups."""
    if jax.default_backend() != "tpu":
        return table.reshape(-1)[idx]
    shape = idx.shape
    out = _vreg_gather_tpu(table, idx.reshape(-1), rows=rows)
    return out.reshape(shape)
