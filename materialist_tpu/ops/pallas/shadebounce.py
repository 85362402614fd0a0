"""Fused per-bounce shade kernel: the whole differentiable radiance math
of one path-vertex — two Disney BRDF evals, two bilinear emitter fetches,
MIS weights, radiance/throughput update — in ONE Pallas pass (and one for
its adjoint).

Why: the XLA formulation of the shade pass lowers to dozens of fusions,
each materializing (s·HW, 3) f32 intermediates in HBM; measured round 3 at
1024²×16 spp it costs 803 ms forward / 2350 ms through the vjp per sample
group, ~85% of the whole inverse step, while the essential math is a few
hundred VPU flops per vertex. This kernel reads each operand once, keeps
every intermediate in vregs, resolves the emitter fetches from a
VMEM-resident table (small optimized emitters, ≤64×64) via the recorded
bilinear tap coords (shader.py trace_step_records — no transcendentals),
and writes only (thr', Δradiance).

The adjoint kernel replays the same math under an IN-KERNEL ``jax.vjp``
(the closure is pure elementwise ops on (8,128) blocks, so its transpose
lowers to Mosaic like any forward op) and emits per-query gradients for
the material blob (d_albedo, d_rough, d_metal — scatter-added into the
table outside by the caller's gather op), the throughput chain, and the
two emitter fetches (d_le — turned into the tiny emitter-table gradient
outside via the span-binned scatter, exactly like
ops/envmap.py::_lookup_bilinear_small_bwd).

Semantics mirror render/shader.py::_shade_chunk's per-bounce block
bit-for-bit in structure (same eps placement, same stop_gradients, same
gating); equivalence is tested in tests/test_shadebounce.py (interpret
mode) and `-m tpu` on hardware.

BRDF reference: ops/brdf.py::eval_brdf (mi_plugin.py:1229-1475).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialist_tpu.ops.pallas.envkernels import (_PLANE, _lookup_plane,
                                                   env_lookup_planes)

_INTERPRET = False

PI = math.pi

# channel layouts (see _shade_chunk's fused branch for the packing)
# blob  (s, n, 5)  f32 : albedo rgb, roughness, metallic     [differentiable]
# thr   (s, n, 3)  f32 : path throughput                     [differentiable]
# nrmf  (s, n, 3)  f32 : shading normal — kept f32: bf16-rounding the
#                        normal alone moves the roughness gradient's L1
#                        aggregate ~15% through dGGX/dρ (measured r4);
#                        wo/win are bf16-derived anyway, so only the
#                        normal needs the full-precision plane
# auxf  (s, n, 8)  bf16: wo(3), win(3), gate_nee, gate_miss
# recb  (s, n, 13) bf16: pdf_e, pdf_at, wi_e(3), uvf(4), uvi(4)
N_BLOB, N_NRM, N_AUX, N_REC = 5, 3, 8, 13


def _sg(x):
    return jax.lax.stop_gradient(x)


def _disney_soa(aR, aG, aB, rough, metal, wx, wy, wz, vx, vy, vz,
                nx, ny, nz):
    """ops/brdf.py::eval_brdf on scalar planes. Returns (fR,fG,fB, pdf)."""
    hx, hy, hz = wx + vx, wy + vy, wz + vz
    hn = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    hn = jnp.maximum(hn, 1e-12)
    hx, hy, hz = hx / hn, hy / hn, hz / hn

    no_l = jnp.maximum(nx * wx + ny * wy + nz * wz, 0.0)
    no_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    vo_h = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
    no_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)

    alpha = rough * rough
    alpha2 = alpha * alpha
    den = no_h * no_h * (alpha2 - 1.0) + 1.0 + 1e-6
    d = alpha2 / (PI * den * den)
    pdf = 0.5 * (d / (4.0 * jnp.maximum(vo_h, 1e-6)) * no_h) \
        + 0.5 * (no_l / PI)

    one_m = 1.0 - metal
    f_d90 = 0.5 + 2.0 * vo_h * vo_h * rough
    pow5 = lambda x: (1.0 - x) ** 5  # noqa: E731
    f_out = 1.0 + (f_d90 - 1.0) * pow5(no_v)
    f_in = 1.0 + (f_d90 - 1.0) * pow5(no_l)
    diff_s = one_m / PI * f_out * f_in * no_l

    k = (rough + 1.0) ** 2 / 8.0
    g = 1.0 / ((no_l * (1.0 - k) + k + 1e-6)
               * (no_v * (1.0 - k) + k + 1e-6))
    dg4 = d * g / 4.0 * no_l
    p5 = pow5(vo_h)

    def chan(a):
        c0 = one_m * 0.04 + metal * a
        fm = c0 + (1.0 - c0) * p5
        return a * diff_s + dg4 * fm

    return chan(aR), chan(aG), chan(aB), pdf


def _lookup4(env_ref, n_planes: int, w: int, h: int, u0, v0, du, dv):
    """In-kernel 4-tap bilinear fetch (ops/envmap.py::lookup_bilinear_at
    semantics: φ-wrap on u, θ-clamp on v — taps precomputed, so only the
    +1 neighbors are derived here)."""
    u1 = jnp.where(u0 + 1 >= w, 0, u0 + 1)
    v1 = jnp.minimum(v0 + 1, h - 1)
    w00 = (1.0 - du) * (1.0 - dv)
    w01 = du * (1.0 - dv)
    w10 = (1.0 - du) * dv
    w11 = du * dv
    out = []
    for c in range(3):
        env_c = env_ref[c * n_planes * 8:(c + 1) * n_planes * 8, :]
        acc = w00 * _lookup_plane(env_c, n_planes, v0 * w + u0)
        acc += w01 * _lookup_plane(env_c, n_planes, v0 * w + u1)
        acc += w10 * _lookup_plane(env_c, n_planes, v1 * w + u0)
        acc += w11 * _lookup_plane(env_c, n_planes, v1 * w + u1)
        out.append(acc)
    return out


def _bounce_math(det, aR, aG, aB, rough, metal, tx, ty, tz,
                 leR, leG, leB, lmR, lmG, lmB):
    """One bounce's differentiable radiance math on scalar planes.

    ``det`` holds the detached planes (records, geometry, gates). The
    positional args are the differentiable leaves — jax.vjp over this
    function IS the bounce adjoint. Mirrors _shade_chunk exactly:
    NEE term gated by (alive & ~shadowed), miss term by (alive & ~hit),
    pdf_b and pdf_b_at_e detached, weight eps/NaN policy of
    render/bsdf.py::disney.weight.
    """
    feR, feG, feB, pdf_be = _disney_soa(
        aR, aG, aB, rough, metal, det["wie_x"], det["wie_y"], det["wie_z"],
        det["wo_x"], det["wo_y"], det["wo_z"],
        det["n_x"], det["n_y"], det["n_z"])
    w_mis = det["pdf_e"] / (det["pdf_e"] + _sg(pdf_be) + 1e-9)
    s_nee = w_mis / (det["pdf_e"] + 1e-9)
    g_nee = det["gate_nee"] > 0.0   # where-gating (not multiply): dead
    zero = jnp.zeros_like(tx)       # lanes may hold inf/nan contributions
    cR = jnp.where(g_nee, tx * feR * s_nee * leR, zero)
    cG = jnp.where(g_nee, ty * feG * s_nee * leG, zero)
    cB = jnp.where(g_nee, tz * feB * s_nee * leB, zero)

    fbR, fbG, fbB, pdf_b = _disney_soa(
        aR, aG, aB, rough, metal, det["win_x"], det["win_y"], det["win_z"],
        det["wo_x"], det["wo_y"], det["wo_z"],
        det["n_x"], det["n_y"], det["n_z"])
    pdf_b = _sg(pdf_b)
    ok = pdf_b > 1e-6
    inv = 1.0 / (pdf_b + 1e-6)

    def wchan(f):
        wc = jnp.where(ok, f * inv, 0.0)
        return jnp.nan_to_num(wc, nan=0.0, posinf=0.0, neginf=0.0)

    wR, wG, wB = wchan(fbR), wchan(fbG), wchan(fbB)
    w_mis_b = pdf_b / (pdf_b + det["pdf_at"] + 1e-9)
    g_miss = det["gate_miss"] > 0.0
    mR = jnp.where(g_miss, tx * wR * w_mis_b * lmR, zero)
    mG = jnp.where(g_miss, ty * wG * w_mis_b * lmG, zero)
    mB = jnp.where(g_miss, tz * wB * w_mis_b * lmB, zero)

    return (tx * wR, ty * wG, tz * wB,
            cR + mR, cG + mG, cB + mB)


def _unpack_det(nrm_ref, auxf_ref, recb_ref):
    f = lambda i: auxf_ref[i].astype(jnp.float32)   # noqa: E731
    r = lambda i: recb_ref[i].astype(jnp.float32)   # noqa: E731
    det = {
        "n_x": nrm_ref[0], "n_y": nrm_ref[1], "n_z": nrm_ref[2],
        "wo_x": f(0), "wo_y": f(1), "wo_z": f(2),
        "win_x": f(3), "win_y": f(4), "win_z": f(5),
        "gate_nee": f(6), "gate_miss": f(7),
        "pdf_e": r(0), "pdf_at": r(1),
        "wie_x": r(2), "wie_y": r(3), "wie_z": r(4),
    }
    uvf = [r(5), r(6), r(7), r(8)]
    uvi = [recb_ref[9 + i].astype(jnp.int32) for i in range(4)]
    return det, uvf, uvi


def _make_fwd_kernel(n_planes: int, h: int, w: int):
    def kernel(env_ref, blob_ref, thr_ref, nrm_ref, auxf_ref, recb_ref,
               out_ref):
        det, uvf, uvi = _unpack_det(nrm_ref, auxf_ref, recb_ref)
        le = _lookup4(env_ref, n_planes, w, h, uvi[0], uvi[1],
                      uvf[0], uvf[1])
        lm = _lookup4(env_ref, n_planes, w, h, uvi[2], uvi[3],
                      uvf[2], uvf[3])
        outs = _bounce_math(
            det, blob_ref[0], blob_ref[1], blob_ref[2],
            blob_ref[3], blob_ref[4],
            thr_ref[0], thr_ref[1], thr_ref[2], *le, *lm)
        for i in range(6):
            out_ref[i, :, :] = outs[i]

    return kernel


def _make_bwd_kernel(n_planes: int, h: int, w: int):
    def kernel(env_ref, blob_ref, thr_ref, nrm_ref, auxf_ref, recb_ref,
               cot_ref, dblob_ref, dthr_ref, dle_ref):
        det, uvf, uvi = _unpack_det(nrm_ref, auxf_ref, recb_ref)
        le = _lookup4(env_ref, n_planes, w, h, uvi[0], uvi[1],
                      uvf[0], uvf[1])
        lm = _lookup4(env_ref, n_planes, w, h, uvi[2], uvi[3],
                      uvf[2], uvf[3])
        args = (blob_ref[0], blob_ref[1], blob_ref[2],
                blob_ref[3], blob_ref[4],
                thr_ref[0], thr_ref[1], thr_ref[2], *le, *lm)
        _, pull = jax.vjp(functools.partial(_bounce_math, det), *args)
        cots = tuple(cot_ref[i] for i in range(6))
        grads = pull(cots)
        for i in range(5):
            dblob_ref[i, :, :] = grads[i]
        for i in range(3):
            dthr_ref[i, :, :] = grads[5 + i]
        for i in range(6):
            dle_ref[i, :, :] = grads[8 + i]

    return kernel


def _to_planes(x, dtype=None):
    """(s, n, C) → (C, nb, 8, 128) padded plane stack."""
    s, n, c = x.shape
    m = s * n
    flat = jnp.moveaxis(x.reshape(m, c), 1, 0)
    pad = (-m) % _PLANE
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    nb = flat.shape[1] // _PLANE
    out = flat.reshape(c, nb, 8, 128)
    return out.astype(dtype) if dtype is not None else out


def _from_planes(x, s, n):
    c = x.shape[0]
    m = s * n
    return jnp.moveaxis(x.reshape(c, -1)[:, :m], 0, 1).reshape(s, n, c)


def _cspec(c):
    return pl.BlockSpec((c, None, 8, 128), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _fwd_call(env_planes, blob, thr, nrmf, auxf, recb, h: int, w: int):
    s, n = thr.shape[:2]
    n_planes = env_planes.shape[0] // 24
    b_t = _to_planes(blob)
    t_t = _to_planes(thr)
    n_t = _to_planes(nrmf, jnp.float32)
    a_t = _to_planes(auxf, jnp.bfloat16)
    r_t = _to_planes(recb)
    nb = t_t.shape[1]
    out = pl.pallas_call(
        _make_fwd_kernel(n_planes, h, w),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_planes * 24, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _cspec(N_BLOB), _cspec(3), _cspec(N_NRM), _cspec(N_AUX),
            _cspec(N_REC),
        ],
        out_specs=_cspec(6),
        out_shape=jax.ShapeDtypeStruct((6, nb, 8, 128), jnp.float32),
        interpret=_INTERPRET,
    )(env_planes, b_t, t_t, n_t, a_t, r_t)
    o = _from_planes(out, s, n)
    return o[..., 0:3], o[..., 3:6]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _bwd_call(env_planes, blob, thr, nrmf, auxf, recb, cot_thr, cot_rad,
              h: int, w: int):
    s, n = thr.shape[:2]
    n_planes = env_planes.shape[0] // 24
    b_t = _to_planes(blob)
    t_t = _to_planes(thr)
    n_t = _to_planes(nrmf, jnp.float32)
    a_t = _to_planes(auxf, jnp.bfloat16)
    r_t = _to_planes(recb)
    c_t = _to_planes(jnp.concatenate([cot_thr, cot_rad], axis=-1))
    nb = t_t.shape[1]
    shp = lambda c: jax.ShapeDtypeStruct((c, nb, 8, 128), jnp.float32)  # noqa: E731
    db, dt, dl = pl.pallas_call(
        _make_bwd_kernel(n_planes, h, w),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n_planes * 24, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _cspec(N_BLOB), _cspec(3), _cspec(N_NRM), _cspec(N_AUX),
            _cspec(N_REC), _cspec(6),
        ],
        out_specs=(_cspec(N_BLOB), _cspec(3), _cspec(6)),
        out_shape=(shp(N_BLOB), shp(3), shp(6)),
        interpret=_INTERPRET,
    )(env_planes, b_t, t_t, n_t, a_t, r_t, c_t)
    return (_from_planes(db, s, n), _from_planes(dt, s, n),
            _from_planes(dl, s, n))


def _denv_from_dle(envmap, recb, dle):
    """Emitter-table gradient from the per-query fetch cotangents.

    Separable-one-hot MXU contraction instead of an 8-tap scatter:
    d_env[v,u,c] = Σ_q voh[q,v] · uoh[q,u] · cot[q,c], where uoh/voh are
    the bilinear-weighted one-hots of each lookup. XLA lowers it as one
    (h, q)×(q, w·3) matmul per lookup — contraction over the huge query
    axis rides the MXU, and the only big intermediate is the fused
    (q, w, 3) product. Measured r3 at 8.4M queries/bounce: ~170 ms for
    the span-scatter formulation (the per-block one-hot build in the
    scatter kernel is VPU-bound) vs ~10 ms here. Works on every backend
    (plain XLA), so it is also the interpret/CPU path."""
    h, w = envmap.shape[0], envmap.shape[1]
    uvf = recb[..., 5:9].astype(jnp.float32)
    uvi = recb[..., 9:13].astype(jnp.int32)
    # bf16 operands halve the (q, w, 3) intermediate's traffic on TPU;
    # XLA-CPU has no bf16 DotThunk, so other backends contract in f32
    bf = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g = jnp.zeros((h, w, 3), jnp.float32)
    for look in range(2):
        u0 = uvi[..., 2 * look].reshape(-1)
        v0 = uvi[..., 2 * look + 1].reshape(-1)
        u1 = jnp.where(u0 + 1 >= w, 0, u0 + 1)
        v1 = jnp.minimum(v0 + 1, h - 1)
        du = uvf[..., 2 * look].reshape(-1, 1)
        dv = uvf[..., 2 * look + 1].reshape(-1, 1)
        cot = dle[..., 3 * look:3 * look + 3].reshape(-1, 3)
        iu = jnp.arange(w, dtype=jnp.int32)
        iv = jnp.arange(h, dtype=jnp.int32)
        # bf16 one-hot weights match the forward's bf16 record fractions
        uoh = ((u0[:, None] == iu).astype(bf) * (1 - du).astype(bf)
               + (u1[:, None] == iu).astype(bf) * du.astype(bf))
        voh = ((v0[:, None] == iv).astype(bf) * (1 - dv).astype(bf)
               + (v1[:, None] == iv).astype(bf) * dv.astype(bf))
        tmp = uoh[:, :, None] * cot.astype(bf)[:, None, :]
        g = g + jnp.einsum("qv,qwc->vwc", voh, tmp,
                           preferred_element_type=jnp.float32)
    return g.astype(envmap.dtype)


@functools.lru_cache(maxsize=8)
def _get_bounce_op(h: int, w: int):
    @jax.custom_vjp
    def bounce(envmap, blob, thr, nrmf, auxf, recb):
        planes = env_lookup_planes(envmap)
        return _fwd_call(planes, blob, thr, nrmf, auxf, recb, h, w)

    def fwd(envmap, blob, thr, nrmf, auxf, recb):
        out = bounce(envmap, blob, thr, nrmf, auxf, recb)
        return out, (envmap, blob, thr, nrmf, auxf, recb)

    def bwd(res, cot):
        envmap, blob, thr, nrmf, auxf, recb = res
        planes = env_lookup_planes(envmap)
        db, dt, dle = _bwd_call(planes, blob, thr, nrmf, auxf, recb,
                                cot[0], cot[1], h, w)
        denv = _denv_from_dle(envmap, recb, dle)
        return denv, db, dt, None, None, None

    bounce.defvjp(fwd, bwd)
    return bounce


def shade_bounce_fused(envmap, blob5, thr, nrmf, auxf, recb):
    """One fused differentiable bounce (TPU/interpret).

    Args:
        envmap: (H, W, 3) small emitter (H, W ≤ 64).
        blob5: (s, n, 5) f32 — albedo rgb, roughness, metallic
            (differentiable; its vjp flows back through whatever gather
            produced it).
        thr: (s, n, 3) f32 throughput (differentiable).
        nrmf: (s, n, 3) f32 — shading normal (full precision; see the
            channel-layout note above).
        auxf: (s, n, 8) — wo(3), win(3), gate_nee, gate_miss (consumed
            in bf16).
        recb: (s, n, 13) bf16 — pdf_e, pdf_at, wi_e(3), uvf(4), uvi(4).
    Returns:
        (thr_out (s, n, 3), rad_delta (s, n, 3)).
    """
    return _get_bounce_op(envmap.shape[0], envmap.shape[1])(
        envmap, blob5, thr, nrmf, auxf, recb)
