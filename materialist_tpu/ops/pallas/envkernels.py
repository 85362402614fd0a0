"""Fused envmap CDF sampling / pdf kernels for small (optimized) emitters.

The trace pass draws one NEE sample and evaluates one MIS pdf per path
vertex. The XLA formulation (ops/envmap.py) uses one-hot contractions —
correct and differentiable, but it materializes (s·n, W)[, H] bf16
intermediates in HBM (~67 MB each at 512²×chunk4, several per bounce):
measured 22 ms (sample) + 10 ms (pdf) per 1M queries, ~35-40% of the
whole trace pass with its spill traffic.

These kernels keep the CDF/pdf tables (≤64×64) entirely in VMEM/SMEM and
resolve each (8,128) block of queries with vreg-local table reads:

* marginal row: H scalar-broadcast compares against m_cdf (SMEM);
* conditional column: binary search over the row's CDF — log2(W) flat
  (8,128)-plane gathers;
* direction + solid-angle pdf math on the VPU (sin/cos in-kernel).

Everything here is an estimator DECISION (stop-gradient in the shader),
so no VJP is needed. Off-TPU callers keep the XLA path; semantics match
ops/envmap.py::sample_dir / pdf_dir (tested in tests/test_envkernels.py,
interpret mode + `-m tpu` on hardware).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

PI = math.pi
_PLANE = 1024
Q_SUB, Q_LANE = 8, 128   # queries per grid step: one (8,128) vreg block


def _plane_pad(table2d):
    """(H, W) → (8·P, 128) plane stack (row-major flat)."""
    h, w = table2d.shape
    n = h * w
    planes = -(-n // _PLANE)
    flat = table2d.reshape(-1)
    if planes * _PLANE - n:
        flat = jnp.pad(flat, (0, planes * _PLANE - n))
    return flat.reshape(planes * 8, 128), planes


def _lookup_plane(planes_ref, n_planes, flat_idx):
    """(8,128) int32 flat idx → (8,128) f32 from an (n_planes·8, 128)
    stack (same composed-vreg-gather trick as the march kernel)."""
    plane_id = flat_idx // _PLANE
    within = flat_idx - plane_id * _PLANE
    v = within // 128
    u = within - v * 128
    rows = []
    for r in range(8):
        u_b = jnp.broadcast_to(u[r:r + 1, :], (8, 128))
        v_b = jnp.broadcast_to(v[r:r + 1, :], (8, 128))
        pid = plane_id[r:r + 1, :]
        acc = jnp.zeros((1, 128), jnp.float32)
        for p in range(n_planes):
            plane = planes_ref[8 * p:8 * p + 8, :]
            b = jnp.take_along_axis(plane, u_b, axis=1)
            val = jnp.take_along_axis(b, v_b, axis=0)[0:1, :]
            acc = val if n_planes == 1 else jnp.where(pid == p, val, acc)
        rows.append(acc)
    return jnp.concatenate(rows, axis=0)


def _make_sample_kernel(h: int, w: int, c_planes: int):
    # lower_bound needs ceil(log2(w)) + 1 halvings to drain size w → 0
    log2w = max(int(math.ceil(math.log2(w))), 1) + 1

    def kernel(mcdf_ref, mpdf_ref, ccdf_ref, cpdf_ref, u_ref,
               wix_ref, wiy_ref, wiz_ref, pdf_ref):
        x0 = u_ref[0]                                  # (8,128)
        x1 = u_ref[1]

        # ---- marginal row: v_idx = #(m_cdf < x0), plus at/prev/pdf — all
        # via H scalar-broadcast reads from SMEM (no vector gathers)
        zeros = jnp.zeros((Q_SUB, Q_LANE), jnp.float32)
        v_cnt = jnp.zeros((Q_SUB, Q_LANE), jnp.int32)
        for r in range(h):
            v_cnt = v_cnt + (mcdf_ref[r] < x0).astype(jnp.int32)
        v_idx = jnp.minimum(v_cnt, h - 1)
        at_m = zeros
        prev_m = zeros
        pdf_m = zeros
        for r in range(h):
            sel = v_idx == r
            at_m = jnp.where(sel, mcdf_ref[r], at_m)
            prev_m = jnp.where(sel, mcdf_ref[r - 1] if r > 0 else 0.0,
                               prev_m)
            pdf_m = jnp.where(sel, mpdf_ref[r], pdf_m)
        dv = jnp.clip((x0 - prev_m) / jnp.maximum(at_m - prev_m, 1e-12),
                      0.0, 1.0)

        # ---- conditional column: lower_bound over the row's CDF by
        # binary search (log2(W) flat-plane gathers)
        row0 = v_idx * w
        lo = jnp.zeros((Q_SUB, Q_LANE), jnp.int32)
        size = jnp.full((Q_SUB, Q_LANE), w, jnp.int32)
        for _ in range(log2w):
            half = size // 2
            mid = lo + half
            val = _lookup_plane(ccdf_ref, c_planes,
                                row0 + jnp.minimum(mid, w - 1))
            go_right = (val < x1) & (size > 0)
            lo = jnp.where(go_right, mid + 1, lo)
            size = jnp.where(go_right, size - half - 1, half)
        u_idx = jnp.minimum(lo, w - 1)

        at_c = _lookup_plane(ccdf_ref, c_planes, row0 + u_idx)
        prev_c = jnp.where(
            u_idx > 0,
            _lookup_plane(ccdf_ref, c_planes,
                          row0 + jnp.maximum(u_idx - 1, 0)), 0.0)
        du = jnp.clip((x1 - prev_c) / jnp.maximum(at_c - prev_c, 1e-12),
                      0.0, 1.0)
        pdf_c = _lookup_plane(cpdf_ref, c_planes, row0 + u_idx)

        # ---- direction + solid-angle pdf (envmap.py::uv_to_dir)
        uu = u_idx.astype(jnp.float32) + du
        vv = v_idx.astype(jnp.float32) + dv
        phi = (2.0 * PI / w) * uu
        theta = (PI / h) * vv
        st = jnp.sin(theta)
        wix_ref[:, :] = st * jnp.sin(phi)
        wiy_ref[:, :] = jnp.cos(theta)
        wiz_ref[:, :] = -st * jnp.cos(phi)
        pdf_ref[:, :] = (h * w) * (pdf_c * pdf_m) / (
            2.0 * PI * PI * jnp.maximum(st, 1e-6))

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _env_sample_tpu(m_cdf, m_pdf, c_cdf_planes, c_pdf_planes, u2_flat,
                    h: int, w: int):
    m = u2_flat.shape[0]
    pad = (-m) % _PLANE
    u_p = jnp.pad(u2_flat, ((0, pad), (0, 0)))
    n_blocks = u_p.shape[0] // _PLANE
    u_t = jnp.moveaxis(u_p.reshape(n_blocks, 8, 128, 2), 3, 1)

    c_planes = c_cdf_planes.shape[0] // 8
    out_shape = [jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32)] * 4
    tile = pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_sample_kernel(h, w, c_planes),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((c_planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple([tile] * 4),
        out_shape=tuple(out_shape),
        interpret=_INTERPRET,
    )(m_cdf, m_pdf, c_cdf_planes, c_pdf_planes, u_t)
    wi = jnp.stack([o.reshape(-1)[:m] for o in outs[:3]], axis=-1)
    pdf = outs[3].reshape(-1)[:m]
    return wi, pdf


def env_sample_dir(sampler, u2):
    """Pallas sample_dir for small EnvmapSampler tables (TPU only).

    Bitwise-comparable semantics to ops/envmap.py::sample_dir (same CDF
    inversion, same interpolation, same pdf); returns (wi (...,3),
    pdf (...,1))."""
    env = sampler.envmap
    h, w = env.shape[0], env.shape[1]
    cc, _ = _plane_pad(sampler.c_cdf)
    cp, _ = _plane_pad(sampler.c_pdf)
    shape = u2.shape[:-1]
    wi, pdf = _env_sample_tpu(sampler.m_cdf, sampler.m_pdf, cc, cp,
                              u2.reshape(-1, 2), h, w)
    return wi.reshape(*shape, 3), pdf.reshape(*shape, 1)


def _make_lookup_kernel(n_planes: int, w: int):
    def kernel(env_ref, idx_ref, wt_ref, r_ref, g_ref, b_ref):
        u0 = idx_ref[0]
        u1 = idx_ref[1]
        v0w = idx_ref[2] * w
        v1w = idx_ref[3] * w
        du = wt_ref[0]
        dv = wt_ref[1]
        w00 = (1.0 - du) * (1.0 - dv)
        w01 = du * (1.0 - dv)
        w10 = (1.0 - du) * dv
        w11 = du * dv
        outs = (r_ref, g_ref, b_ref)
        for c in range(3):
            env_c = env_ref[c * n_planes * 8:(c + 1) * n_planes * 8, :]
            acc = w00 * _lookup_plane(env_c, n_planes, v0w + u0)
            acc += w01 * _lookup_plane(env_c, n_planes, v0w + u1)
            acc += w10 * _lookup_plane(env_c, n_planes, v1w + u0)
            acc += w11 * _lookup_plane(env_c, n_planes, v1w + u1)
            outs[c][:, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _env_lookup_tpu(env_planes, idx_flat, wt_flat, h: int, w: int):
    m = idx_flat.shape[0]
    pad = (-m) % _PLANE
    idx_p = jnp.pad(idx_flat, ((0, pad), (0, 0)))
    wt_p = jnp.pad(wt_flat, ((0, pad), (0, 0)))
    n_blocks = idx_p.shape[0] // _PLANE
    idx_t = jnp.moveaxis(idx_p.reshape(n_blocks, 8, 128, 4), 3, 1)
    wt_t = jnp.moveaxis(wt_p.reshape(n_blocks, 8, 128, 2), 3, 1)
    n_planes = env_planes.shape[0] // 24

    tile = pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_lookup_kernel(n_planes, w),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_planes * 24, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile, tile, tile),
        out_shape=tuple([jax.ShapeDtypeStruct((n_blocks, 8, 128),
                                              jnp.float32)] * 3),
        interpret=_INTERPRET,
    )(env_planes, idx_t, wt_t)
    return jnp.stack([o.reshape(-1)[:m] for o in outs], axis=-1)


def env_lookup_planes(envmap):
    """Pack an (H, W, 3) emitter into the (3·planes·8, 128) VMEM stack
    consumed by :func:`env_lookup_bilinear_tpu` (channels stacked along
    the sublane axis so one ref slices all three)."""
    stacks = [_plane_pad(envmap[..., c])[0] for c in range(3)]
    return jnp.concatenate(stacks, axis=0)


def env_lookup_bilinear_tpu(env_planes, u0i, u1i, v0i, v1i, du, dv,
                            h: int, w: int):
    """Fused 4-tap bilinear emitter fetch for small maps (TPU only).

    The XLA one-hot formulation (ops/envmap.py::_lookup_bilinear_small)
    materializes (…, W) bf16 one-hots and (…, W, 3) row intermediates in
    HBM — measured 385 ms fwd / ~double that through the checkpoint
    recompute per 1024²×16 spp shade group, the single largest cost of
    the inverse step. Here the ≤64×64 table lives in VMEM and each
    (8,128) query block resolves its 4 taps with vreg-local plane reads:
    HBM traffic drops to the queries themselves (~28 B/query).

    Exact f32 weights (the XLA path quantizes the weighted one-hots to
    bf16 — this kernel is strictly more accurate). Differentiability is
    handled by the caller's custom VJP; this is the forward only.
    """
    shape = u0i.shape
    idx = jnp.stack([u0i.reshape(-1), u1i.reshape(-1),
                     v0i.reshape(-1), v1i.reshape(-1)], axis=-1)
    wt = jnp.stack([du.reshape(-1), dv.reshape(-1)], axis=-1)
    out = _env_lookup_tpu(env_planes, idx, wt, h, w)
    return out.reshape(*shape, 3)


def _make_pdf_kernel(h: int, w: int, c_planes: int):
    # Mosaic has no atan2/acos lowering: the direction→(u,v,sinθ) mapping
    # runs in XLA (elementwise, fuses into the caller) and arrives as
    # channels [ui, vi, st] (small ints exact in f32).
    def kernel(mpdf_ref, cpdf_ref, q_ref, pdf_ref):
        ui = q_ref[0].astype(jnp.int32)
        vi = q_ref[1].astype(jnp.int32)
        st = q_ref[2]

        pdf_m = jnp.zeros((Q_SUB, Q_LANE), jnp.float32)
        for r in range(h):
            pdf_m = jnp.where(vi == r, mpdf_ref[r], pdf_m)
        pdf_c = _lookup_plane(cpdf_ref, c_planes, vi * w + ui)
        pdf_ref[:, :] = (h * w) * (pdf_c * pdf_m) / (2.0 * PI * PI * st)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _env_pdf_tpu(m_pdf, c_pdf_planes, d_flat, h: int, w: int):
    m = d_flat.shape[0]
    # direction → integer texel + sinθ (ops/envmap.py::dir_to_uv semantics)
    phi01 = jnp.arctan2(d_flat[:, 0], -d_flat[:, 2]) / (2.0 * PI)
    u = (phi01 - jnp.floor(phi01)) * w
    theta = jnp.arccos(jnp.clip(d_flat[:, 1], -1.0, 1.0))
    v = theta / PI * h
    q = jnp.stack([jnp.clip(u, 0, w - 1).astype(jnp.int32)
                   .astype(jnp.float32),
                   jnp.clip(v, 0, h - 1).astype(jnp.int32)
                   .astype(jnp.float32),
                   jnp.maximum(jnp.sin(theta), 1e-6)], axis=-1)
    pad = (-m) % _PLANE
    d_p = jnp.pad(q, ((0, pad), (0, 0)))
    n_blocks = d_p.shape[0] // _PLANE
    d_t = jnp.moveaxis(d_p.reshape(n_blocks, 8, 128, 3), 3, 1)
    c_planes = c_pdf_planes.shape[0] // 8

    out = pl.pallas_call(
        _make_pdf_kernel(h, w, c_planes),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((c_planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
        interpret=_INTERPRET,
    )(m_pdf, c_pdf_planes, d_t)
    return out.reshape(-1)[:m]


def env_pdf_dir(sampler, d):
    """Pallas pdf_dir for small EnvmapSampler tables (TPU only)."""
    env = sampler.envmap
    h, w = env.shape[0], env.shape[1]
    cp, _ = _plane_pad(sampler.c_pdf)
    shape = d.shape[:-1]
    pdf = _env_pdf_tpu(sampler.m_pdf, cp, d.reshape(-1, 3), h, w)
    return pdf.reshape(*shape, 1)
