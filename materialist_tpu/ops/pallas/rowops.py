"""Span-binned row gather / scatter-add — Pallas kernels for the
material-table fetches and their adjoints.

XLA's TPU gather/scatter serialize per index (~14 ns/row measured
in-graph; the scatter adjoint is worse), which made the (M≈4–17M rows per
step) material fetch and its scatter-add adjoint two of the three largest
step components. These kernels exploit the *spatial coherence* of
screen-space path tracing: queries arrive in (1024,) blocks of rays from
adjacent pixels, whose hit indices cluster in a small row range. Per
block the kernel computes the span [min, max] of its indices and sweeps
only the covering row tiles, turning the data movement into one-hot
matmuls that ride the MXU:

    gather:  outᵀ (K,1024)    = Σ_tiles  tileᵀ (K,T) @ onehotᵀ (T,1024)
    scatter: outᵀ[:, tile] (K,T) += cotᵀ (K,1024) ·contract_q· onehotᵀ (T,1024)

where onehotᵀ[r, q] = (idx[q] − tile₀ == r) is built by an iota-compare
in its NATURAL layout (queries along lanes) — no transposes inside the
kernel, and the scatter accumulator lives CHANNEL-MAJOR (K, N) so the
long row axis fills the 128-lane dimension (a row-major (N, 8) output
block pads 8 lanes to 128 and wastes 16× VMEM). TPU grid steps run
sequentially on a core, so the scatter's read-modify-write accumulation
into the VMEM-resident output is safe.

Correctness does not depend on coherence — a worst-case random
permutation sweeps every tile (slow but exact). Padding queries index
row 0 with zero cotangents.

VMEM sizing (v5e: 128 MB/core): the full table (gather) or accumulator
(scatter) sits in VMEM; callers split the channel axis into
≤ VMEM_TABLE_BYTES slabs automatically (not needed below ~1536² maps).
Off-TPU both functions fall back to plain indexed ops
(bitwise-equivalent semantics).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False   # tests run the kernels in Pallas interpret mode

Q = 1024           # queries per grid step (one lane-major (1, 1024) row)
T = 512            # rows per table tile
VMEM_TABLE_BYTES = 72 * 1024 * 1024    # of the 128 MB/core on v5e

# Mosaic's default scoped-VMEM limit is 16 MB; the VMEM-resident table /
# accumulator design needs the real budget (measured 128 MB on v5e —
# leave headroom for the double-buffered idx/cot/out blocks)
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def _gather_kernel(idx_ref, tbl_ref, out_ref, *, n_tiles, k, precision):
    idxb = idx_ref[0:1, :]        # (1, Q) int32 lanes (None dim squeezed)
    t_lo = jnp.min(idxb) // T
    t_hi = jnp.max(idxb) // T

    iota = jax.lax.broadcasted_iota(jnp.int32, (T, Q), 0)
    acc0 = jnp.zeros((k, Q), jnp.float32)

    def tile_body(t, acc):
        rel = idxb - t * T                              # (1, Q)
        onehot = (iota == rel).astype(jnp.float32)      # (T, Q) natural
        tile = tbl_ref[t]                               # (K, T)
        return acc + jax.lax.dot_general(
            tile, onehot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    out_ref[:, :] = jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, acc0)


@functools.partial(jax.jit, static_argnames=("n_rows", "k", "exact"))
def _row_gather_tpu(tbl_tiles, idx_flat, n_rows: int, k: int,
                    exact: bool = True):
    n_tiles = tbl_tiles.shape[0]
    m = idx_flat.shape[0]
    pad = (-m) % Q
    idx_p = jnp.pad(idx_flat, (0, pad)).reshape(-1, 1, Q)
    n_blocks = idx_p.shape[0]

    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    outt = pl.pallas_call(
        functools.partial(_gather_kernel, n_tiles=n_tiles, k=k,
                          precision=precision),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((None, 1, Q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k, T), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, k, Q), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, k, Q), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(idx_p, tbl_tiles)
    return jnp.moveaxis(outt, 1, 2).reshape(-1, k)[:m]


def _tileize(table):
    """(N, K) → (n_tiles, K, T) with N padded up to a multiple of T."""
    n, k = table.shape
    n_tiles = -(-n // T)
    padded = jnp.pad(table, ((0, n_tiles * T - n), (0, 0)))
    return jnp.moveaxis(padded.reshape(n_tiles, T, k), 1, 2), n_tiles


def row_gather(table, idx, exact: bool = True, coherent: bool = False):
    """table (N, K) float; idx (...,) int32 in [0, N) → (..., K) f32.

    ``coherent=True`` (indices cluster within each 1024-query block —
    sorted order, primary-bounce pixel order, contiguous row slices):
    span-binned MXU kernel, measured 30 ms / 8.4M×13ch on v5e.
    ``coherent=False`` (DEFAULT — secondary-bounce hit indices span the
    whole table; measured r3: mean block span 1943/2048 tiles on the
    indoor fixture, making the span sweep ~2 s/call): XLA's serialized
    gather, ~8.2 ns/row INDEPENDENT of row width (69 ms / 8.4M).

    ``exact=True`` selects full-f32 matmul passes in the kernel (bitwise
    row selection); ``exact=False`` uses the MXU's native bf16 passes —
    values round to bf16 (~2⁻⁸ relative), free wherever the consumer
    stores bf16 anyway. Off-TPU: ``table[idx]`` (always exact).
    """
    if jax.default_backend() != "tpu" or not coherent:
        return table[idx].astype(jnp.float32)
    n, k = table.shape
    shape = idx.shape
    idx_flat = idx.reshape(-1)
    n_tiles = -(-n // T)
    bytes_per_ch = n_tiles * T * 4
    ch_per_call = max(int(VMEM_TABLE_BYTES // bytes_per_ch), 1)
    outs = []
    for c0 in range(0, k, ch_per_call):
        sub = table[:, c0:c0 + ch_per_call].astype(jnp.float32)
        tiles, nt = _tileize(sub)
        outs.append(_row_gather_tpu(tiles, idx_flat, n, sub.shape[1],
                                    exact=exact))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return out.reshape(*shape, k)


def _scatter_kernel(idx_ref, cot_ref, out_ref, *, n_tiles, k,
                    precision):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    idxb = idx_ref[0:1, :]        # (1, Q) lanes (None dim squeezed)
    t_lo = jnp.min(idxb) // T
    t_hi = jnp.max(idxb) // T
    cott = cot_ref[:, :]                                # (K, Q)
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, Q), 0)

    def tile_body(t, _):
        rel = idxb - t * T
        onehot = (iota == rel).astype(jnp.float32)      # (T, Q)
        # (K, T) = cotᵀ ·over q· onehotᵀ (both lane-major; "NT" matmul)
        add = jax.lax.dot_general(
            cott, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        r0 = t * T
        out_ref[:, pl.ds(r0, T)] = out_ref[:, pl.ds(r0, T)] + add
        return 0

    jax.lax.fori_loop(t_lo, t_hi + 1, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "k", "exact"))
def _row_scatter_tpu(cot_flat, idx_flat, n_rows: int, k: int,
                     exact: bool = True):
    m = idx_flat.shape[0]
    pad = (-m) % Q
    idx_p = jnp.pad(idx_flat, (0, pad)).reshape(-1, 1, Q)
    cott = jnp.moveaxis(
        jnp.pad(cot_flat, ((0, pad), (0, 0))).T.reshape(k, -1, Q), 1, 0)
    n_blocks = idx_p.shape[0]
    n_tiles = -(-n_rows // T)

    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    outt = pl.pallas_call(
        functools.partial(_scatter_kernel, n_tiles=n_tiles, k=k,
                          precision=precision),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((None, 1, Q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, k, Q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, n_tiles * T), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, n_tiles * T), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=_INTERPRET,
    )(idx_p, cott)
    return outt.T[:n_rows]


_ADJOINT_EXACT = os.environ.get("MATERIALIST_EXACT_ADJOINT") == "1"


def set_adjoint_exact(on: bool) -> None:
    """Select the f32-payload sort variant for the differentiable-gather
    adjoints (row_gather_diff, render/bsdf.py _reuse_gather) instead of
    the default bf16-packed one (ADVICE r4: keep the exact path available
    as a quality fallback). Must be called before the programs are traced
    — the flag is read at trace time, so flipping it later only affects
    new compilations."""
    global _ADJOINT_EXACT
    _ADJOINT_EXACT = bool(on)


def adjoint_exact() -> bool:
    return _ADJOINT_EXACT


def row_scatter_add(cot, idx, n_rows: int, exact: bool = True,
                    coherent: bool = False):
    """Adjoint of row_gather: Σ over queries of cot rows at idx.

    cot (..., K) f32, idx (...,) int32 → (n_rows, K) f32.

    ``coherent=False`` (DEFAULT — unstructured indices): sort-then-span.
    With ``exact=False`` the cotangent channels ride THROUGH the sort
    network as bf16 pairs packed into i32 payload operands — measured r4
    at 8.4M×5ch: 58 ms (7.0 ns/row) vs 151 ms for sort-by-iota + a
    serialized permutation gather (the r3 design; the permutation at
    ~16 ns/row was the bottleneck) vs 719 ms for XLA ``.at[].add``.
    ``exact=True`` keeps f32 cotangents: sorted by iota + permutation
    gather (exactness over speed). ``coherent=True``: indices already
    cluster per block — straight to the span kernel. Off-TPU:
    ``zeros.at[idx].add``. Padding rows contribute zero cotangent.
    """
    k = cot.shape[-1]
    cot_flat = cot.reshape(-1, k).astype(jnp.float32)
    idx_flat = idx.reshape(-1)
    if jax.default_backend() != "tpu":
        return jnp.zeros((n_rows, k), jnp.float32).at[idx_flat].add(cot_flat)
    if not coherent and not exact:
        m = idx_flat.shape[0]
        cb = cot_flat.astype(jnp.bfloat16)
        if k % 2:
            cb = jnp.pad(cb, ((0, 0), (0, 1)))
        u16 = jax.lax.bitcast_convert_type(cb, jnp.uint16).astype(jnp.uint32)
        words = u16[:, 0::2] | (u16[:, 1::2] << 16)   # (M, ceil(K/2)) u32
        ops = (idx_flat,) + tuple(words[:, j]
                                  for j in range(words.shape[1]))
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        idx_flat = sorted_ops[0]
        w_s = jnp.stack(sorted_ops[1:], axis=-1)
        lo = (w_s & 0xFFFF).astype(jnp.uint16)
        hi = (w_s >> 16).astype(jnp.uint16)
        cot_flat = jax.lax.bitcast_convert_type(
            jnp.stack([lo, hi], axis=-1).reshape(m, -1)[:, :k],
            jnp.bfloat16).astype(jnp.float32)
    elif not coherent:
        # lax.sort carries the permutation as payload, so the sorted keys
        # come out of the sort network directly — only the (wide) cot rows
        # pay the one serialized permutation gather
        idx_flat, perm = jax.lax.sort(
            (idx_flat, jnp.arange(idx_flat.shape[0], dtype=jnp.int32)),
            num_keys=1)
        cot_flat = cot_flat[perm]
    n_tiles = -(-n_rows // T)
    bytes_per_ch = n_tiles * T * 4
    ch_per_call = max(int(VMEM_TABLE_BYTES // bytes_per_ch), 1)
    if ch_per_call >= k:
        return _row_scatter_tpu(cot_flat, idx_flat, n_rows, k,
                                exact=exact)
    outs = []
    for c0 in range(0, k, ch_per_call):
        sub = cot_flat[:, c0:c0 + ch_per_call]
        outs.append(_row_scatter_tpu(sub, idx_flat, n_rows, sub.shape[1],
                                     exact=exact))
    return jnp.concatenate(outs, axis=-1)


@jax.custom_vjp
def row_gather_diff(table, idx):
    """Differentiable row gather: forward = row_gather (span-binned kernel
    on TPU), backward = row_scatter_add into the table cotangent. The
    index path carries no gradient (estimator decisions are detached).

    Use where the gathered rows must carry gradients to the table but the
    rows were NOT pre-fetched by a trace pass (the record-light shade
    path: re-gathering costs one kernel call; the records shrink by
    22 B/path-vertex, which is what fits 1024²×64spp in HBM)."""
    return row_gather(table, idx)


def _row_gather_diff_fwd(table, idx):
    proto = jnp.zeros((0,), table.dtype)   # dtype token (a valid JAX type)
    return (row_gather(table, idx, exact=adjoint_exact()),
            (idx, table.shape[0], proto))


def _row_gather_diff_bwd(res, cot):
    idx, n_rows, proto = res
    g = row_scatter_add(cot, idx, n_rows,
                        exact=adjoint_exact()).astype(proto.dtype)
    return (g, None)


row_gather_diff.defvjp(_row_gather_diff_fwd, _row_gather_diff_bwd)


# ---------------------------------------------------------------------------
# Path-compaction helpers (round-4 wavefront restructure).
#
# Measured alive fractions on the shipped fixtures (scripts/diag_hitrates):
# indoor 0.40/0.16, jinjya 0.25/0.08 at bounces 1/2 — i.e. most secondary
# rays are DEAD (their previous lobe march missed) yet still occupy lanes
# in every march/gather/scatter/shade op. Compacting the live rays between
# bounces multiplies the whole step.
#
# The key property making compaction cheap on TPU: a stable partition of an
# ascending index sequence keeps indices ASCENDING, so every producer/
# consumer reordering in the compacted pipeline is a *coherent* (monotone)
# gather or scatter — the span-binned MXU kernels above resolve those at
# ~3 ns/row, never a serialized op or a sort.
# ---------------------------------------------------------------------------


def _f32_exact_split(i):
    """int32 (< 2^26) → two f32-exact channels (hi, lo), base 2^13."""
    hi = i // 8192
    lo = i - hi * 8192
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def _f32_exact_join(hi, lo):
    return (hi.astype(jnp.int32) * 8192 + lo.astype(jnp.int32))


def compact_sel(alive, cap: int):
    """Stable-compaction index vector of the live rays.

    alive (M,) bool → (sel (cap,) int32 ascending, count int32 scalar).
    sel[j] = position of the j-th live ray for j < count; 0 (padding)
    beyond. Live rays past `cap` are dropped (callers size `cap` with
    margin; the estimator treats dropped rays as dead — same gating as a
    ray that missed). Pure jnp + one coherent span scatter: dest =
    prefix-count is monotone.
    """
    m = alive.shape[0]
    a = alive.astype(jnp.int32)
    dest = jnp.cumsum(a) - 1                      # monotone where alive
    count = jnp.minimum(dest[-1] + 1, cap)
    keep = alive & (dest < cap)
    # dead rays scatter ZERO into their neighboring prefix slot (dest is
    # the running prefix count there) — NOT into row 0, which would
    # stretch every block's span back to tile 0 and make the coherent
    # span sweep quadratic in the block index
    dest_c = jnp.clip(dest, 0, cap - 1)
    hi, lo = _f32_exact_split(jnp.arange(m, dtype=jnp.int32))
    vals = jnp.stack([jnp.where(keep, hi, 0.0),
                      jnp.where(keep, lo, 0.0)], axis=-1)
    packed = row_scatter_add(vals, dest_c, cap, exact=True, coherent=True)
    return _f32_exact_join(packed[:, 0], packed[:, 1]), count


def gather_rows_coherent(table, sel):
    """Detached coherent row gather (span kernel / plain indexing off-TPU).

    table (M, K) f32-exact values; sel (cap,) ascending int32. Used by the
    trace to pull the surviving rays' state through a compaction in ONE
    fused fetch (ints ride as f32 VALUES — exact below 2^24)."""
    return row_gather(table, sel, exact=True, coherent=True)


@jax.custom_vjp
def gather_coherent_diff(table, sel):
    """Differentiable coherent row gather: fwd span gather, bwd span
    scatter — both O(covered tiles) because `sel` is ascending (the
    throughput chain across a compaction)."""
    return row_gather(table, sel, exact=True, coherent=True)


def _gcd_fwd(table, sel):
    proto = jnp.zeros((0,), table.dtype)
    return (row_gather(table, sel, exact=True, coherent=True),
            (sel, table.shape[0], proto))


def _gcd_bwd(res, cot):
    sel, n_rows, proto = res
    g = row_scatter_add(cot, sel, n_rows, exact=True,
                        coherent=True).astype(proto.dtype)
    return (g, None)


gather_coherent_diff.defvjp(_gcd_fwd, _gcd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def scatter_add_coherent_diff(n_rows, values, idx):
    """Differentiable coherent scatter-add: fwd span scatter of `values`
    rows into an (n_rows, K) zero table at ascending idx; bwd = coherent
    gather of the output cotangent (the film accumulation across a
    compaction). Padding rows must carry zero values."""
    return row_scatter_add(values, idx, n_rows, exact=True, coherent=True)


def _sacd_fwd(n_rows, values, idx):
    proto = jnp.zeros((0,), values.dtype)
    return (row_scatter_add(values, idx, n_rows, exact=True,
                            coherent=True), (idx, proto))


def _sacd_bwd(n_rows, res, cot):
    idx, proto = res
    g = row_gather(cot, idx, exact=True,
                   coherent=True).astype(proto.dtype)
    return (g, None)


scatter_add_coherent_diff.defvjp(_sacd_fwd, _sacd_bwd)
