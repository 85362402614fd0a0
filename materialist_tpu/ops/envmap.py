"""Equirectangular environment-map lighting: lookup, CDF importance sampling.

Completes the reference's torch-side sampler (myutils/envmap_utils.py, which
is imported by the inverse driver but unused at runtime because Mitsuba's
emitter did the sampling — SURVEY.md §2.5). Here it *is* the light sampler
for NEE/MIS in the G-buffer path tracer.

Direction convention (matches envmap_utils.py:29-36 and Mitsuba's equirect
emitter): u = frac(atan2(d.x, -d.z) / 2π) * W,  v = (acos(d.y)/π) * H, so
    dir(θ, φ) = (sinθ·sinφ, cosθ, -sinθ·cosφ),  φ = 2π u/W,  θ = π v/H.

Note: the reference's ``build_envmap`` computes the marginal row weights as
the sum of the *cumulative* conditional (envmap_utils.py:54), which skews
the marginal toward early columns; since that code never ran in production,
we build the correct marginal (row weight = row total of lum·sinθ).
"""

from __future__ import annotations

import math

import jax
from typing import NamedTuple

import jax.numpy as jnp

from materialist_tpu.ops.color import luminance

PI = math.pi


class EnvmapSampler(NamedTuple):
    envmap: jnp.ndarray  # (H, W, 3) linear radiance
    c_cdf: jnp.ndarray   # (H, W) conditional CDF along width (normalized)
    m_cdf: jnp.ndarray   # (H,)  marginal CDF over rows (normalized)
    c_pdf: jnp.ndarray   # (H, W) per-texel conditional prob mass
    m_pdf: jnp.ndarray   # (H,)  per-row marginal prob mass


class FlatEnvmapSampler(NamedTuple):
    """Large-emitter sampler: one flat CDF over all H·W texels, inverted by
    binary search (jnp.searchsorted ⇒ O(log HW) gathers/sample) instead of
    the one-hot contractions that are only viable for tiny maps. Used for
    relighting with full-resolution HDRs (e.g. the reference's 512×1024
    envmaps/41.hdr, render_final.py:241-260)."""
    envmap: jnp.ndarray   # (H, W, 3)
    cdf: jnp.ndarray      # (H·W,) normalized inclusive CDF
    pmass: jnp.ndarray    # (H, W) per-texel probability mass


# one-hot contractions cost O(axis) per lookup — only a win for tiny maps
# (the 16×32 optimized emitter); larger maps take the gather path
SMALL_ENV_AXIS = 64


def _is_small(h: int, w: int) -> bool:
    return h <= SMALL_ENV_AXIS and w <= SMALL_ENV_AXIS


def dir_to_uv(d, height: int, width: int):
    """Direction (..., 3) → continuous texel coords (u, v)."""
    phi = jnp.arctan2(d[..., 0], -d[..., 2]) / (2.0 * PI)
    u = (phi - jnp.floor(phi)) * width
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    v = theta / PI * height
    return u, v


def uv_to_dir(u, v, height: int, width: int):
    """Continuous texel coords → unit direction."""
    phi = 2.0 * PI * u / width
    theta = PI * v / height
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi)],
                     axis=-1)


def _onehot(idx, size):
    """(…,) int32 → (…, size) bf16 one-hot. For the 16/32-sized envmap axes
    this turns every table access into a small matmul/select-reduce: TPU's
    general gather is ~8 ns/element and its scatter adjoint is worse, while
    one-hot contractions ride the MXU *and* differentiate to transposed
    matmuls (no scatter at all). bf16: one-hots are exact in bf16, and the
    (…, 32) tensors are the largest HBM buffers of the whole inverse step
    (1 GB each at 1024²×chunk 8 in f32 — the 1024² OOM driver)."""
    rng = jnp.arange(size, dtype=jnp.int32)
    return (idx[..., None] == rng).astype(jnp.bfloat16)


def lookup_nearest(envmap, d):
    """Nearest-texel radiance fetch (envmap_utils.py:29-36 semantics)."""
    h, w = envmap.shape[0], envmap.shape[1]
    u, v = dir_to_uv(d, h, w)
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    if not _is_small(h, w):
        return envmap.reshape(h * w, 3)[vi * w + ui]
    rows = jnp.einsum("...h,hwc->...wc", _onehot(vi, h),
                      envmap.astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)
    return jnp.einsum("...wc,...w->...c", rows, _onehot(ui, w),
                      preferred_element_type=jnp.float32)


def bilinear_coords(d, h: int, w: int):
    """Direction → bilinear tap coords: (u0i, v0i int32, du, dv f32).

    The expensive part of an emitter fetch is this mapping (atan2 + arccos
    — measured ~3 ns/query on v5e, as much as the fetch itself), NOT the
    4-tap interpolation. The trace pass therefore records these coords per
    path vertex so the shade pass (and its checkpoint recompute) never
    runs a transcendental: see shader.py trace_step_records.
    """
    u, v = dir_to_uv(d, h, w)
    uf = u - 0.5
    vf = v - 0.5
    u0 = jnp.floor(uf)
    v0 = jnp.floor(vf)
    du = uf - u0
    dv = vf - v0
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    return u0i, v0i, du, dv


def lookup_bilinear_at(envmap, u0i, v0i, du, dv):
    """Bilinear radiance fetch from precomputed tap coords (φ-wrap /
    θ-clamp already folded in by :func:`bilinear_coords`). Gather-free
    one-hot/Pallas path for small maps (differentiable with a scatter
    adjoint); flat gathers for large relighting emitters."""
    h, w = envmap.shape[0], envmap.shape[1]
    u1i = jnp.mod(u0i + 1, w)
    v1i = jnp.clip(v0i + 1, 0, h - 1)
    du = du[..., None]
    dv = dv[..., None]

    if not _is_small(h, w):
        flat = envmap.reshape(h * w, 3)
        t00 = flat[v0i * w + u0i]
        t01 = flat[v0i * w + u1i]
        t10 = flat[v1i * w + u0i]
        t11 = flat[v1i * w + u1i]
        top = t00 * (1.0 - du) + t01 * du
        bot = t10 * (1.0 - du) + t11 * du
        return top * (1.0 - dv) + bot * dv

    return _lookup_bilinear_small(envmap, u0i, u1i, v0i, v1i, du, dv)


def lookup_bilinear(envmap, d):
    """Bilinear radiance fetch with φ-wrap / θ-clamp (Mitsuba emitter
    eval). Gather-free one-hot contractions for small maps (differentiable
    with a transposed-matmul adjoint, no scatter); flat gathers for large
    relighting emitters."""
    h, w = envmap.shape[0], envmap.shape[1]
    u0i, v0i, du, dv = bilinear_coords(d, h, w)
    return lookup_bilinear_at(envmap, u0i, v0i, du, dv)


@jax.custom_vjp
def _lookup_bilinear_small(envmap, u0i, u1i, v0i, v1i, du, dv):
    """One-hot bilinear fetch for tiny maps with a scatter backward.

    Forward: bf16 one-hot contractions (the (…, W) weighted one-hots are
    the dominant HBM buffers at high res — bf16 one-hots are exact, only
    the ~2^-8-quantized bilinear weights ride along). Backward: 4 weighted
    scatter-adds into the (tiny) emitter — the naive einsum transpose
    materializes f32 (…, W[,C]) cotangent intermediates (1 GB each at
    1024²×chunk 8; they OOM'd the north-star workload).

    No gradient flows to the direction (du/dv/indices) — all call sites
    pass detached directions (detached-sampling estimator).

    Precision note: the backward uses EXACT f32 bilinear weights while the
    forward quantizes the weighted one-hots to bf16, so the VJP is the
    gradient of a slightly different function (~2^-8 relative weight
    mismatch). This is intentional — the weights are estimator constants
    (detached), the mismatch is far below MC noise at any spp, and f32
    backward weights are strictly more accurate. Gradient tests comparing
    against numeric differences of the bf16 forward must allow ~1e-2.
    """
    h, w = envmap.shape[0], envmap.shape[1]
    if jax.default_backend() == "tpu":
        # fused Pallas fetch: the table lives in VMEM, the (…, W) one-hot
        # intermediates never exist (measured r3: the XLA formulation's
        # HBM traffic was the single largest cost of the inverse step)
        from materialist_tpu.ops.pallas.envkernels import (
            env_lookup_bilinear_tpu, env_lookup_planes)
        planes = env_lookup_planes(envmap)
        return env_lookup_bilinear_tpu(planes, u0i, u1i, v0i, v1i,
                                       du[..., 0], dv[..., 0], h, w)
    du16 = du.astype(jnp.bfloat16)
    dv16 = dv.astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    uoh = _onehot(u0i, w) * (one - du16) + _onehot(u1i, w) * du16
    voh = _onehot(v0i, h) * (one - dv16) + _onehot(v1i, h) * dv16
    rows = jnp.einsum("...h,hwc->...wc", voh,
                      envmap.astype(jnp.bfloat16),
                      preferred_element_type=jnp.bfloat16)
    return jnp.einsum("...wc,...w->...c", rows, uoh,
                      preferred_element_type=jnp.float32)


def _lookup_bilinear_small_fwd(envmap, u0i, u1i, v0i, v1i, du, dv):
    out = _lookup_bilinear_small(envmap, u0i, u1i, v0i, v1i, du, dv)
    return out, (envmap, u0i, u1i, v0i, v1i, du, dv)


def _lookup_bilinear_small_bwd(res, cot):
    envmap, u0i, u1i, v0i, v1i, du, dv = res
    h, w = envmap.shape[0], envmap.shape[1]
    c = envmap.shape[2]
    taps = ((v0i, u0i, (1 - du) * (1 - dv)),
            (v0i, u1i, du * (1 - dv)),
            (v1i, u0i, (1 - du) * dv),
            (v1i, u1i, du * dv))
    if jax.default_backend() == "tpu":
        # one span-binned MXU scatter for all 4 taps: the emitter is ≤8
        # row-tiles, so every query block sweeps ≤8 one-hot matmuls no
        # matter how incoherent the directions — ~15 ms vs 4 serialized
        # XLA scatters at ~240 ms for 8.4M queries (measured r3)
        from materialist_tpu.ops.pallas.rowops import row_scatter_add
        idx_all = jnp.concatenate(
            [(vi * w + ui).reshape(-1) for vi, ui, _ in taps])
        cot_all = jnp.concatenate(
            [(wt * cot).reshape(-1, c) for _, _, wt in taps])
        g = row_scatter_add(cot_all, idx_all, h * w,
                            coherent=True).astype(envmap.dtype)
    else:
        g = jnp.zeros((h * w, c), envmap.dtype)
        for vi, ui, wt in taps:
            g = g.at[(vi * w + ui).reshape(-1)].add(
                (wt * cot).reshape(-1, c))
    return (g.reshape(envmap.shape), None, None, None, None, None, None)


_lookup_bilinear_small.defvjp(_lookup_bilinear_small_fwd,
                              _lookup_bilinear_small_bwd)


def build_sampler(envmap) -> EnvmapSampler:
    """Build sin-weighted luminance CDFs (role of envmap_utils.py:43-66).

    Defensive sampling: the per-texel weight is floored at 1% of the mean
    so near-black texels never get ~0 pdf — the bilinear radiance estimate
    can be nonzero where the sampled texel is black, and le/pdf would
    otherwise produce unbounded estimates whose gradients NaN the envmap
    net (observed during on-device inverse runs). The pdf stays exactly
    consistent with these tables, so the estimator remains unbiased.
    """
    h, w = envmap.shape[0], envmap.shape[1]
    rows01 = (jnp.arange(h, dtype=envmap.dtype) + 0.5) / h
    sin_theta = jnp.sin(PI * rows01)[:, None]
    lum_sin = luminance(envmap) * sin_theta
    lum_sin = jnp.maximum(lum_sin, 0.01 * jnp.mean(lum_sin) + 1e-12)

    if not _is_small(h, w):
        flat = lum_sin.reshape(-1)
        cdf = jnp.cumsum(flat)
        total = cdf[-1]
        return FlatEnvmapSampler(envmap, cdf / total, lum_sin / total)

    c_sum = jnp.cumsum(lum_sin, axis=1)
    row_tot = c_sum[:, -1:]
    c_cdf = c_sum / row_tot
    c_pdf = lum_sin / row_tot

    m_sum = jnp.cumsum(row_tot[:, 0], axis=0)
    total = m_sum[-1]
    m_cdf = m_sum / total
    m_pdf = row_tot[:, 0] / total
    return EnvmapSampler(envmap, c_cdf, m_cdf, c_pdf, m_pdf)


def _interp_cdf(cdf_val_at, cdf_val_prev, x):
    """Fractional position of x within a CDF bin (envmap_utils.py:92-107)."""
    denom = jnp.maximum(cdf_val_at - cdf_val_prev, 1e-12)
    return jnp.clip((x - cdf_val_prev) / denom, 0.0, 1.0)


def sample_dir(sampler: EnvmapSampler, u2):
    """Decision half of ``sample``: (wi, pdf) without the radiance lookup
    (used by the non-differentiable trace pass — the shadow march needs
    the direction, not the emitter value).

    On TPU, small-map sampling runs in a fused Pallas kernel
    (ops/pallas/envkernels.py): the XLA one-hot formulation materializes
    (…, W) HBM intermediates that dominated the trace pass. The kernel is
    an estimator decision — NOT differentiable (neither is this path:
    ``sample`` detaches wi/pdf)."""
    if (isinstance(sampler, EnvmapSampler)
            and jax.default_backend() == "tpu"):
        from materialist_tpu.ops.pallas import envkernels as ek
        return ek.env_sample_dir(sampler, u2)
    wi, pdf, _ = sample(sampler, u2, with_radiance=False)
    return wi, pdf


def sample(sampler: EnvmapSampler, u2, with_radiance: bool = True):
    """Inverse-CDF envmap sample (envmap_utils.py:139-169, corrected dirs).

    Args:
        sampler: EnvmapSampler.
        u2: (..., 2) uniforms.
    Returns:
        wi: (..., 3) direction; pdf: (..., 1) solid-angle density;
        radiance: (..., 3) bilinear emitter radiance along wi (None when
        ``with_radiance=False``).
    """
    if isinstance(sampler, FlatEnvmapSampler):
        return _sample_flat(sampler, u2, with_radiance)
    env, c_cdf, m_cdf, c_pdf, m_pdf = sampler
    h, w = env.shape[0], env.shape[1]
    x0, x1 = u2[..., 0], u2[..., 1]

    # gather-free inverse CDF: searchsorted = comparison count against the
    # (tiny) CDF vectors; per-row tables fetched via one-hot contraction
    v_idx = jnp.clip(
        jnp.sum((m_cdf < x0[..., None]).astype(jnp.int32), -1), 0, h - 1)
    voh = _onehot(v_idx, h)
    m_cdf_prev = jnp.concatenate([jnp.zeros((1,), m_cdf.dtype),
                                  m_cdf[:-1]])
    at_m = voh @ m_cdf
    prev_m = voh @ m_cdf_prev
    dv = _interp_cdf(at_m, prev_m, x0)
    pdf_m = voh @ m_pdf
    v = v_idx.astype(env.dtype) + dv

    row_cdf = jnp.einsum("...h,hw->...w", voh, c_cdf)
    u_idx = jnp.clip(
        jnp.sum((row_cdf < x1[..., None]).astype(jnp.int32), axis=-1),
        0, w - 1)
    uoh = _onehot(u_idx, w)
    uoh_prev = _onehot(jnp.maximum(u_idx - 1, 0), w)
    at_c = jnp.sum(row_cdf * uoh, -1)
    prev_c = jnp.where(u_idx > 0, jnp.sum(row_cdf * uoh_prev, -1), 0.0)
    du = _interp_cdf(at_c, prev_c, x1)
    pdf_c = jnp.sum(jnp.einsum("...h,hw->...w", voh, c_pdf) * uoh, -1)
    u = u_idx.astype(env.dtype) + du

    theta = v * PI / h
    # The sampled direction (and pdf) are estimator *decisions*: detach them
    # so radiance gradients flow into the envmap values only, never back
    # through the CDF inversion (whose interpolation divisions are not
    # safely differentiable). Detached-sampling semantics, like the
    # reference's D.data pdf (mi_plugin.py:366).
    wi = jax.lax.stop_gradient(uv_to_dir(u, v, h, w))
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-6)
    pdf = jax.lax.stop_gradient(
        (h * w) * (pdf_c * pdf_m) / (2.0 * PI * PI * sin_theta))
    radiance = lookup_bilinear(env, wi) if with_radiance else None
    return wi, pdf[..., None], radiance


def _sample_flat(sampler: FlatEnvmapSampler, u2, with_radiance: bool):
    """Inverse of the flat H·W CDF by binary search; the CDF-bin fraction
    supplies the in-texel u offset, the second uniform the v offset."""
    env, cdf, pmass = sampler
    h, w = env.shape[0], env.shape[1]
    x0, x1 = u2[..., 0], u2[..., 1]

    i = jnp.clip(jnp.searchsorted(cdf, x0, side="left"), 0, h * w - 1)
    at = cdf[i]
    prev = jnp.where(i > 0, cdf[jnp.maximum(i - 1, 0)], 0.0)
    du = _interp_cdf(at, prev, x0)
    vi = i // w
    ui = i - vi * w
    u = ui.astype(env.dtype) + du
    v = vi.astype(env.dtype) + x1

    theta = v * PI / h
    wi = jax.lax.stop_gradient(uv_to_dir(u, v, h, w))
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-6)
    pm = pmass.reshape(-1)[i]
    pdf = jax.lax.stop_gradient(
        (h * w) * pm / (2.0 * PI * PI * sin_theta))
    radiance = lookup_bilinear(env, wi) if with_radiance else None
    return wi, pdf[..., None], radiance


def pdf_dir(sampler, d):
    """Density of ``sample`` at an arbitrary direction (for MIS weights).

    TPU small-map path: fused Pallas kernel (detached — all call sites
    stop-gradient the MIS pdfs, mi_plugin.py:366 semantics)."""
    if (isinstance(sampler, EnvmapSampler)
            and jax.default_backend() == "tpu"):
        from materialist_tpu.ops.pallas import envkernels as ek
        return ek.env_pdf_dir(sampler, d)
    env = sampler.envmap
    h, w = env.shape[0], env.shape[1]
    u, v = dir_to_uv(d, h, w)
    ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    sin_theta = jnp.maximum(jnp.sin(theta), 1e-6)
    if isinstance(sampler, FlatEnvmapSampler):
        pm = sampler.pmass.reshape(-1)[vi * w + ui]
        pdf = (h * w) * pm / (2.0 * PI * PI * sin_theta)
        return pdf[..., None]
    voh = _onehot(vi, h)
    cp = jnp.sum(jnp.einsum("...h,hw->...w", voh, sampler.c_pdf)
                 * _onehot(ui, w), -1)
    mp = voh @ sampler.m_pdf
    pdf = (h * w) * (cp * mp) / (2.0 * PI * PI * sin_theta)
    return pdf[..., None]


def rotate(envmap, angle_degrees: float):
    """Roll the envmap columns (render_final.py:290-298 rolling relight)."""
    w = envmap.shape[1]
    shift = int(round(angle_degrees / 360.0 * w))
    return jnp.roll(envmap, shift, axis=1)
