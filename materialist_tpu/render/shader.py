"""Differentiable Monte-Carlo G-buffer path tracer.

The TPU-native replacement for Mitsuba's `path` integrator + MatDiffBSDF +
envmap emitter + Dr.Jit AD (reference call stack SURVEY.md §3.2):

* primary visibility = the pixel grid (camera fixed, geometry = depth map);
* per-vertex BSDF = Disney-diffuse + GGX-metal with 50/50 lobe sampling
  (ops/brdf.py, matching mi_plugin.py:1296-1427 semantics);
* direct light = balance-heuristic MIS between BSDF samples and envmap
  CDF importance samples (NEE), like Mitsuba's path integrator;
* ≥2nd bounces = screen-space marching (render/screenspace.py), envmap on
  miss; max_depth=4 ⇒ 3 statically-unrolled scattering events;
* the sample (spp) axis is scanned in chunks with jax.checkpoint so the
  backward pass re-materializes one chunk at a time — the whole
  render-forward + adjoint fits in HBM at 512²×64spp and beyond.

Gradient semantics: sampling decisions, pdfs, MIS weights and all geometry
queries are stop_gradient'ed (detached-sampling estimator; the reference
detaches the NDF inside its pdf, mi_plugin.py:366, and Mitsuba's attached
quantities are likewise the BSDF values and emitter radiance only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.ops import brdf, envmap as em
from materialist_tpu.render.scene import GBuffer, Materials
from materialist_tpu.render import screenspace as ss


class RenderConfig(NamedTuple):
    """Static render parameters (hashable ⇒ usable as a jit static arg)."""
    spp: int = 64
    chunk: int = 8           # samples per scanned chunk
    max_depth: int = 4       # path segments, Mitsuba convention
    use_mesh_normal: bool = True
    march_steps: int = 24
    shadow_steps: int = 16
    nee: bool = True          # envmap NEE + MIS (Mitsuba path behavior)
    sky_background: bool = True  # invalid pixels show the envmap
    march_impl: str = "fused"  # "fused": whole-march Pallas kernel (vreg
    #                            gathers, production path; exact-equal CPU
    #                            fallback); "mip": per-step MXU-gather
    #                            lookups; "exact": full-res per-step tests
    mip_factor: int = 4
    fine_steps: int = 6       # fine substeps within the candidate interval
    shadow_fine_steps: int = 2
    fine_factor: int = 2      # fine-pass surface table resolution divisor
    film_jitter: float = 0.0  # box-filter halfwidth (pixels, ≤ 0.5) for
    # continuous in-pixel film sampling with bilinear G-buffer geometry —
    # the analog of Mitsuba's hdrfilm in-pixel sampling over the
    # interpolated mesh; 0 renders pixel centers only
    march_vectorized: bool = False  # exact impl only: step-parallel march
    # (fast CPU compile, large intermediates) vs statically unrolled (TPU)
    replay_blob: bool = True  # record trace-fetched bf16 material rows for
    # the shade pass (fast: zero shade-side gathers; ~22 B/path-vertex of
    # HBM). Disable at high res × high spp where records outgrow HBM —
    # the shade then re-gathers (slower, memory-light).
    march_grazing_cos: float = 0.105  # exclude near-grazing pixels
    # (|cos(view, normal)| below this) from the march GEOMETRY — the
    # analog of the reference's boundary-triangle removal at minAngle 6°
    # (mesh_recon.py:126-156): stretched depth columns at occlusion edges
    # are not real surfaces and must not occlude. sin(6°) ≈ 0.105.
    lds: bool = True  # low-discrepancy sampling: per-pixel Cranley-
    # Patterson-rotated rank-1 (R2) lattices over the chunk's sample axis
    # for the NEE/lobe/film uniforms, replacing i.i.d. draws. Marginally
    # uniform (unbiased); measured ≈2× lower estimator variance at spp 16
    # on the indoor fixture. Pure arithmetic on the existing PRNG keys —
    # no extra memory traffic, identical trace/shade determinism.
    march_bg_fill: int = 0  # background-depth propagation across the
    # grazing-masked bands (iterations of a 3×3 deeper-neighbor fill;
    # 0 disables). The reference "propagates background depth across
    # boundaries" (mesh_recon.py:161-175) so its mesh has extended
    # background surfaces at silhouettes; this option reproduces that
    # geometry for the march. MEASURED (r4, 512²×64spp vs
    # rendered_img.exr): fill=16 → 21.12 dB, fill=0 → 21.33 dB — the
    # extension slightly HURTS parity on the indoor fixture (the
    # propagated bands occlude more than Mitsuba's stretched boundary
    # triangles do), so it defaults off.
    march_interval_frac: float = 0.05  # thickness heuristic: a march
    # crossing whose penetration behind the (fine) surface exceeds
    # interval_frac × the local view distance is a silhouette PASS-THROUGH
    # (the ray went behind a thin object), not a hit — the heightfield is
    # otherwise infinitely thick and over-occludes vs the reference's
    # thin depth mesh (duplicated vertices at discontinuities,
    # mesh_recon.py:182-300). The r4 bias hunt (scripts/diag_bias.py)
    # identified this as THE interior-bias source of the 21.3 dB forward-
    # parity plateau: at 512²×64spp vs rendered_img.exr, 2.0 (≈ never
    # fires, the r3 behavior) → 21.33 dB; 0.50 → 21.33; 0.20 → 21.81;
    # 0.10 → 23.36; **0.05 → 24.30**; 0.02 → 24.23. Disabling NEE shadows
    # entirely gave 22.38 — finite thickness beats both extremes because
    # it keeps true occlusion while letting rays pass behind thin sheets.
    compact_caps: tuple = ()  # wavefront path compaction: per-secondary-
    # bounce ray-capacity fractions of the chunk's ray count, e.g.
    # (0.5, 0.25) for max_depth 4. After each lobe march the DEAD rays
    # (miss ⇒ no further vertices) are dropped by a stable partition and
    # bounce b+1 runs on the live prefix only — measured alive fractions
    # on the fixtures are 0.40/0.16 (indoor) and 0.25/0.08 (jinjya), so
    # most secondary lanes were dead weight in every march/gather/shade
    # op. Stable partition keeps ray order ascending, so every reordering
    # is a *coherent* span-kernel gather/scatter (~3 ns/row), and the
    # per-ray estimator is UNCHANGED (same draws via film-indexed streams,
    # same marches, same records — tests assert numeric agreement). Live
    # rays beyond a cap are treated as dead: size caps with margin
    # (probe_compact_caps). Empty tuple disables compaction.


def _march_valid(cfg: RenderConfig, gbuf: GBuffer):
    """March-geometry validity: scene validity minus near-grazing pixels
    (reference analog: boundary triangles removed before meshing)."""
    if cfg.march_grazing_cos <= 0.0:
        return gbuf.valid
    cos_v = jnp.abs(jnp.sum(gbuf.normal_geo * gbuf.wo, axis=-1))
    return gbuf.valid & (cos_v > cfg.march_grazing_cos)


def _max3x3(x):
    """3×3 neighborhood max with edge clamping."""
    p = jnp.pad(x, 1, mode="edge")
    h, w = x.shape
    out = x
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            out = jnp.maximum(out, p[1 + dv:1 + dv + h, 1 + du:1 + du + w])
    return out


def _march_geometry(cfg: RenderConfig, gbuf: GBuffer):
    """(dist, valid) the marches test against: grazing-masked bands are
    FILLED with propagated background depth (mesh_recon.py:161-175
    analog) instead of left as holes, so rays passing behind a silhouette
    hit the extended background rather than escaping to the envmap.
    Pixels invalid in the scene itself (mesh_mask) stay holes."""
    sg = jax.lax.stop_gradient
    march_ok = _march_valid(cfg, gbuf)
    dist = sg(gbuf.dist)
    if cfg.march_bg_fill <= 0:
        return dist, march_ok
    neg = jnp.float32(-1.0)
    d = jnp.where(march_ok, dist, neg)
    v = march_ok
    scene_v = gbuf.valid
    for _ in range(cfg.march_bg_fill):
        dn = _max3x3(d)
        fill = (~v) & scene_v & (dn > 0.0)
        d = jnp.where(fill, dn, d)
        v = v | fill
    return jnp.where(v, d, dist), v


def _make_march_fns(cfg: RenderConfig, cam: Camera, dist_map, valid_map):
    """March/occlusion closures for the configured implementation.

    Returns (do_march, do_occlude, do_pair); do_pair resolves the lobe
    march AND the NEE shadow march of a vertex in one fused kernel on TPU
    (ops/pallas/march_kernel.py::march_pair) — the marches are ~70% of the
    trace pass, and pairing shares the kernel launch and layout work."""
    ivf = cfg.march_interval_frac
    if cfg.march_impl == "fused":
        from materialist_tpu.ops.pallas.march_kernel import (march_fused,
                                                             march_pair)

        def do_march(pos_, wi_):
            return march_fused(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.march_steps,
                               fine_steps=cfg.fine_steps,
                               interval_frac=ivf)

        def do_occlude(pos_, wi_):
            return march_fused(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.shadow_steps,
                               fine_steps=max(cfg.shadow_fine_steps, 1),
                               shadow_only=cfg.shadow_fine_steps == 0,
                               interval_frac=ivf).hit

        def do_pair(pos_, wi_, wi_e_):
            return march_pair(cam, dist_map, valid_map, pos_, wi_, wi_e_,
                              n_steps=cfg.march_steps,
                              fine_steps=cfg.fine_steps,
                              shadow_steps=cfg.shadow_steps,
                              shadow_fine_steps=cfg.shadow_fine_steps,
                              interval_frac=ivf)
    elif cfg.march_impl == "mip":
        mip = ss.build_min_mip(dist_map, valid_map, cfg.mip_factor)
        fine_table = ss.build_fine_table(dist_map, valid_map,
                                         cfg.fine_factor)

        def do_march(pos_, wi_):
            return ss.march_mip(cam, dist_map, valid_map, mip, pos_, wi_,
                                n_steps=cfg.march_steps,
                                fine_steps=cfg.fine_steps,
                                mip_factor=cfg.mip_factor,
                                fine_table=fine_table,
                                fine_factor=cfg.fine_factor,
                                interval_frac=ivf)

        def do_occlude(pos_, wi_):
            return ss.march_mip(cam, dist_map, valid_map, mip, pos_, wi_,
                                n_steps=cfg.shadow_steps,
                                fine_steps=cfg.shadow_fine_steps,
                                mip_factor=cfg.mip_factor,
                                shadow_only=cfg.shadow_fine_steps == 0,
                                fine_table=fine_table,
                                fine_factor=cfg.fine_factor,
                                interval_frac=ivf).hit

        def do_pair(pos_, wi_, wi_e_):
            return do_march(pos_, wi_), do_occlude(pos_, wi_e_)
    else:
        def do_march(pos_, wi_):
            return ss.march(cam, dist_map, valid_map, pos_, wi_,
                            n_steps=cfg.march_steps,
                            vectorized=cfg.march_vectorized,
                            interval_frac=ivf)

        def do_occlude(pos_, wi_):
            return ss.occluded(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.shadow_steps,
                               vectorized=cfg.march_vectorized,
                               interval_frac=ivf)

        def do_pair(pos_, wi_, wi_e_):
            return do_march(pos_, wi_), do_occlude(pos_, wi_e_)
    return do_march, do_occlude, do_pair


class FilmSlice(NamedTuple):
    """Row range of the film this render call covers (px sharding).

    The G-buffer, material tables and march targets stay FULL-film (a
    secondary ray can march anywhere); only the primary rays and the
    output image are restricted to rows [row0, row0+n_rows). With
    ``None`` (default) the whole film renders. ``row0`` may be a traced
    scalar (e.g. axis_index·n_rows inside shard_map); ``n_rows`` must be
    static. This is how parallel/sharding.py runs THE production
    estimator per shard instead of a forked reimplementation (round-2
    VERDICT item 3)."""
    row0: object
    n_rows: int


def _slice_rows(x, start, size: int):
    """Rows [start, start+size) of a flat (N, ...) table; start may be
    traced."""
    return jax.lax.dynamic_slice_in_dim(x, start, size, axis=0)


def _film_base(film, h: int, w: int):
    """(pixel-id offset, local row count) for a FilmSlice (or full film)."""
    if film is None:
        return 0, h
    return film.row0 * w, film.n_rows


def _primary_idx(key, cfg: RenderConfig, h: int, w: int, s: int,
                 film=None):
    """Initial per-sample pixel index (no film jitter — the continuous-AA
    primary state is built by _primary_state)."""
    off, n_rows = _film_base(film, h, w)
    n = n_rows * w
    return jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32) + off, (s, n))


# plastic-constant (R2) lattice generators (public QMC construction —
# Roberts 2018) and the golden ratio: the additive recurrence frac(i·g)
# is a near-optimally-stratified point set for every prefix length
_R2_G = (0.7548776662466927, 0.5698402909980532)
_PHI_1 = 0.6180339887498949


def _lds_uniform(key, s, n_loc, dims):
    """(s, n_loc, dims) uniforms as per-pixel Cranley-Patterson-rotated
    rank-1 lattices over the sample axis (R2 for 2-D streams, golden
    ratio for 1-D). Each u is marginally uniform, so every estimator
    built on it stays unbiased; within a pixel the s samples of one
    stream are near-perfectly stratified. Streams/pixels decorrelate via
    independent rotation draws from `key` (padded-QMC construction)."""
    g = jnp.asarray(_R2_G[:dims] if dims >= 2 else (_PHI_1,), jnp.float32)
    t = jnp.arange(s, dtype=jnp.float32)[:, None, None]
    off = jax.random.uniform(key, (1, n_loc, dims))
    return jnp.mod(t * g + off, 1.0)


def _stream_uniform(cfg, key, s, n_loc, dims):
    """One estimator random stream: rotated lattice (cfg.lds) or i.i.d."""
    if cfg.lds:
        return _lds_uniform(key, s, n_loc, dims)
    return jax.random.uniform(key, (s, n_loc, dims))


def _shifted_stack(img_hw_c, h, w):
    """3×3 edge-clamped shifted copies of an (h, w, C) map, as a dict
    {(dv, du): (h·w, C)}. Shifted-map selects replace per-sample gathers
    for film AA: taps of a ±half-pixel-jittered sample live in the 3×3
    pixel neighborhood, so bilinear/nearest fetches become elementwise
    masks over these copies — whose adjoint is masked reverse shifts,
    never a scatter."""
    out = {}
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            p = jnp.pad(img_hw_c, ((1, 1), (1, 1), (0, 0)), mode="edge")
            out[(dv, du)] = p[1 + dv:1 + dv + h,
                              1 + du:1 + du + w].reshape(h * w, -1)
    return out


def _select_shift(stack, dv, du):
    """Per-sample pick among the 3×3 shifts; dv/du (s, n) int32 ∈ [-1,1]."""
    acc = None
    for (sv, su), m in stack.items():
        mask = ((dv == sv) & (du == su))[..., None]
        term = jnp.where(mask, m, 0.0)
        acc = term if acc is None else acc + term
    return acc


def _primary_state(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                   s: int, film=None):
    """Continuous-AA primary vertex geometry (Mitsuba in-pixel film
    sampling, box filter of halfwidth cfg.film_jitter ≤ 0.5):

    * sample position cu = u+.5+ju with ju ~ U(-r, r);
    * view distance + geometric normal bilinearly interpolated at the
      sample position (validity-weighted, so geometry never blends with
      masked pixels) — the analog of Mitsuba's barycentric interpolation
      over the depth-derived mesh;
    * world position = continuous ray dir × interpolated distance;
    * materials stay the pixel's own row: the reference gathers at
      floor(screen) (mi_plugin.py:1378-1381) and floor(u+.5+ju) == u for
      |ju| < .5 — so the identity-gather optimization survives AA.

    Built entirely from 3×3 shifted map copies (zero gathers; geometry is
    stop-gradient anyway). Deterministic in `key`: trace and shade
    recompute identical state. Returns (nrm_geo0, pos0, wo0, valid0).
    """
    h, w = gbuf.dist.shape
    off, n_rows = _film_base(film, h, w)
    n = n_rows * w
    r = min(cfg.film_jitter, 0.5)
    kj = jax.random.fold_in(key, 991)
    jit = (_stream_uniform(cfg, kj, s, n, 2) * 2.0 - 1.0) * r
    ju, jv = jit[..., 0], jit[..., 1]

    base = jnp.arange(n, dtype=jnp.int32) + off
    u_pix = (base % w).astype(jnp.float32)
    v_pix = (base // w).astype(jnp.float32)
    cu = u_pix + 0.5 + ju      # (s, n) continuous film coords
    cv = v_pix + 0.5 + jv

    sg = jax.lax.stop_gradient
    geo_maps = jnp.concatenate(
        [gbuf.dist[..., None], gbuf.normal_geo,
         gbuf.valid[..., None].astype(jnp.float32)], axis=-1)
    # stacks built from the FULL maps, then sliced to the film rows: taps
    # at slice boundaries read the true neighbor rows (an automatic halo),
    # so a px-sharded render interpolates exactly like the unsharded one
    geo_stack = {k: sg(_slice_rows(v, off, n)) for k, v in
                 _shifted_stack(geo_maps, h, w).items()}

    # bilinear taps: texel centers at integer+0.5 ⇒ tap0 = floor(c-0.5);
    # fu = u + ju ∈ [u-.5, u+.5) so floor(fu) ∈ {u-1, u}
    fu = cu - 0.5
    fv = cv - 0.5
    u0 = jnp.floor(fu)
    v0 = jnp.floor(fv)
    wu = (fu - u0)[..., None]
    wv = (fv - v0)[..., None]
    du0 = jnp.clip(u0.astype(jnp.int32) - base % w, -1, 0)
    dv0 = jnp.clip(v0.astype(jnp.int32) - base // w, -1, 0)

    def tap(dv, du, wgt):
        g = _select_shift(geo_stack, dv, du)
        ok = g[..., 4:5]
        return g * (wgt * ok), wgt * ok

    t00, w00 = tap(dv0, du0, (1.0 - wu) * (1.0 - wv))
    t01, w01 = tap(dv0, du0 + 1, wu * (1.0 - wv))
    t10, w10 = tap(dv0 + 1, du0, (1.0 - wu) * wv)
    t11, w11 = tap(dv0 + 1, du0 + 1, wu * wv)
    wsum = w00 + w01 + w10 + w11
    geo = (t00 + t01 + t10 + t11) / jnp.maximum(wsum, 1e-9)
    valid0 = wsum[..., 0] > 1e-6
    dist = geo[..., 0]
    nrm_geo = geo[..., 1:4]
    nrm_geo = nrm_geo / jnp.maximum(
        jnp.linalg.norm(nrm_geo, axis=-1, keepdims=True), 1e-9)

    x = (cu - cam.cx) / cam.focal
    y = -(cv - cam.cy) / cam.focal
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    pos0 = sg(d * dist[..., None])
    wo0 = -d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                           1e-9)
    return sg(nrm_geo), pos0, wo0, valid0


def _pos_from_idx(cam: Camera, idx, dist):
    """World position of pixel `idx` at view distance `dist` — pure math,
    replacing a 3-channel position gather (only the 1-channel dist needs
    fetching)."""
    w = cam.width
    uu = (idx % w).astype(jnp.float32) + 0.5
    vv = (idx // w).astype(jnp.float32) + 0.5
    x = (uu - cam.cx) / cam.focal
    y = -(vv - cam.cy) / cam.focal
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    return d * dist[..., None]


def _fused_shade_eligible(cfg: RenderConfig, bsdf, envmap) -> bool:
    """Whether the fused Pallas shade-bounce kernel will shade this
    configuration (ops/pallas/shadebounce.py). Trace and shade MUST agree:
    in fused mode the trace records the kernel's packed detached inputs
    (aux/recb) instead of the generic path's individual fields."""
    from materialist_tpu.ops.pallas import shadebounce as _sb
    return (cfg.nee and cfg.use_mesh_normal and bsdf.kind == "disney"
            and em._is_small(envmap.shape[0], envmap.shape[1])
            and (jax.default_backend() == "tpu" or _sb._INTERPRET))


def _trace_chunk_paths(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                       mats: Materials, envmap, bsdf=None, film=None):
    """Decision pass of the path-replay estimator: sample all stochastic
    choices and resolve visibility (the expensive marches). Returns per
    bounce (shadowed, hit, idx, blob16, nrm16): the visibility records
    plus the bf16 material/normal rows fetched at the path vertices — the
    shade pass replays them through a free-forward custom-VJP gather, so
    the step performs each row-gather exactly ONCE (the step is gather-
    bound: ~13 ns/row × 4M rows × several tables per bounce otherwise).

    Nothing here is differentiable, so the backward pass never re-runs a
    march or a gather. This is the detached-sampling decomposition of the
    reference's estimator (pdf/dirs detached, mi_plugin.py:366) taken to
    its TPU-natural conclusion: Dr.Jit's megakernel interleaves
    trace+shade and re-traces in the adjoint; here geometry is resolved
    once per step.
    """
    h, w = gbuf.dist.shape
    n = h * w
    s = cfg.chunk

    if bsdf is None:
        from materialist_tpu.render import bsdf as bsdf_mod
        bsdf = bsdf_mod.disney(mats)

    sg = jax.lax.stop_gradient
    env_sampler = em.build_sampler(sg(envmap))
    dist_flat = sg(gbuf.dist.reshape(n))
    nrm_geo_flat = sg(gbuf.normal_geo.reshape(n, 3))
    # ONE stop-grad side table so each bounce needs a single row-gather:
    # [bsdf blob (K) | dist hi+lo (2) | geometric normal (3)]. The gather
    # runs in the span-binned kernel's fast mode (values round to bf16 —
    # free for blob/normal, which are recorded in bf16 anyway); the view
    # distance is split hi/lo so the reconstructed f32 position keeps
    # ~2⁻¹⁶ relative accuracy against the march's bias tolerances.
    march_dist, march_ok = _march_geometry(cfg, gbuf)
    k_blob = bsdf.table.shape[-1] if bsdf.table is not None else None
    if k_blob is not None:
        # hit positions reconstruct from the MARCH depth (incl. the
        # background-filled bands — the hit is on the extended surface)
        mdist_flat = march_dist.reshape(n)
        dist_hi = mdist_flat.astype(jnp.bfloat16).astype(jnp.float32)
        dist_lo = mdist_flat - dist_hi
        combo = jnp.concatenate(
            [sg(bsdf.table), dist_hi[:, None], dist_lo[:, None],
             nrm_geo_flat], axis=-1)
    do_march, do_occlude, do_pair = _make_march_fns(
        cfg, cam, march_dist, march_ok)

    off, n_rows = _film_base(film, h, w)
    n_loc = n_rows * w
    idx = _primary_idx(key, cfg, h, w, s, film)
    wo = jnp.broadcast_to(_slice_rows(gbuf.wo.reshape(n, 3), off, n_loc),
                          (s, n_loc, 3))
    identity0 = bsdf.table is not None

    # wavefront compaction state (cfg.compact_caps): base_alive gates the
    # live rays of the CURRENT bounce's array; film_idx maps each row of a
    # compacted array back to its (sample, pixel) slot in the chunk grid;
    # pending holds the (sel, count, vtx, film, wo16) extras describing
    # how the next bounce's arrays were formed (recorded for the shade)
    m0 = s * n_loc
    do_compact = bool(cfg.compact_caps) and identity0 and k_blob is not None
    # fused-shade mode: record the shade kernel's packed detached inputs
    # (rec_aux bf16: nrm|wo|win|gates, rec_recb bf16: pdfs|wi_e|uv taps) so
    # the shade pass — AND its checkpoint recompute in the backward — is
    # pure kernel calls with zero packing glue (measured r4: the aux/recb
    # assembly passes were a double-digit share of the 1024² shade side)
    fused = _fused_shade_eligible(cfg, bsdf, envmap)
    base_alive = None
    film_idx = None
    pending = None
    if do_compact or fused:
        from materialist_tpu.ops.pallas.rowops import (
            _f32_exact_join, _f32_exact_split, compact_sel,
            gather_rows_coherent)
        valid_rows = _slice_rows(gbuf.valid.reshape(n), off, n_loc)
        base_alive = jnp.broadcast_to(valid_rows, (s, n_loc))

    def _caps_abs(b_next):
        frac = cfg.compact_caps[min(b_next - 1,
                                    len(cfg.compact_caps) - 1)]
        cap = int(-(-(frac * m0) // 1024) * 1024)
        return max(min(cap, m0), 1024)

    records = []
    for b in range(cfg.max_depth - 1):
        kb = jax.random.fold_in(key, b)
        k_lobe, k_uv, k_nee = jax.random.split(kb, 3)
        extras = pending
        pending = None

        if b == 0 and identity0 and cfg.film_jitter > 0.0:
            # continuous film AA: jittered ray + interpolated geometry;
            # materials remain the identity row (floor(u+.5±r) == u)
            nrm_geo, pos, wo, valid0 = _primary_state(key, cfg, cam, gbuf,
                                                      s, film)
            if base_alive is not None:
                base_alive = base_alive & valid0
            blob = sg(_slice_rows(bsdf.table, off, n_loc))
            rec_blob = None
            rec_nrm = None
        elif b == 0 and identity0:
            # primary bounce: the gather is the identity map (or a
            # contiguous row slice under px sharding) — use the (N, K)
            # tables directly and let broadcasting add the sample axis
            # (no gather, and in the shade pass no scatter adjoint)
            blob = sg(_slice_rows(bsdf.table, off, n_loc))
            nrm_geo = _slice_rows(nrm_geo_flat, off, n_loc)
            pos = jnp.broadcast_to(
                _slice_rows(gbuf.position.reshape(n, 3), off, n_loc),
                (s, n_loc, 3))
            rec_blob = None
            rec_nrm = None
        elif k_blob is not None:
            # ONE wide row fetch per bounce (ops/pallas/rowops.py):
            # secondary-bounce hit indices span the whole table (measured
            # r3: ~1990/2048 tiles per 1024-query block), so this routes
            # to XLA's serialized gather — ~8 ns/row INDEPENDENT of row
            # width, which is why the 13 channels ride one gather
            from materialist_tpu.ops.pallas.rowops import row_gather
            fetched = row_gather(combo, idx, exact=False)
            blob = fetched[..., :k_blob]
            pos = _pos_from_idx(
                cam, idx, fetched[..., k_blob] + fetched[..., k_blob + 1])
            nrm_geo = fetched[..., k_blob + 2:k_blob + 5]
            if cfg.replay_blob:
                # fused shade consumes blob[..., :5] only (albedo/rough/
                # metal — the normal rides the separate f16 record), so
                # replay records carry 5 channels there: −6 B/path-vertex
                rec_blob = (blob[..., :5] if fused
                            else blob).astype(jnp.bfloat16)
                rec_nrm = (nrm_geo.astype(jnp.bfloat16)
                           if cfg.use_mesh_normal else None)
            else:
                rec_blob = None
                rec_nrm = None
        else:
            blob = sg(bsdf.gather(idx))
            pos = _pos_from_idx(cam, idx, dist_flat[idx])
            nrm_geo = nrm_geo_flat[idx]
            rec_blob = None
            rec_nrm = None
        if cfg.use_mesh_normal:
            nrm = nrm_geo
        else:
            nm = blob[..., 5:8]
            nrm = nm / jnp.maximum(
                jnp.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)

        eh, ew = envmap.shape[0], envmap.shape[1]
        if film_idx is None:
            u1 = _stream_uniform(cfg, k_lobe, s, n_loc, 1)
            u2 = _stream_uniform(cfg, k_uv, s, n_loc, 2)
            u_nee = (_stream_uniform(cfg, k_nee, s, n_loc, 2)
                     if cfg.nee else None)
        else:
            # compacted bounce: draw the per-(sample, pixel) streams on
            # the full grid (identical values to the uncompacted
            # estimator) and pull the surviving rays' draws through in
            # ONE coherent span gather (film_idx is ascending)
            ug = [_stream_uniform(cfg, k_lobe, s, n_loc, 1),
                  _stream_uniform(cfg, k_uv, s, n_loc, 2)]
            if cfg.nee:
                ug.append(_stream_uniform(cfg, k_nee, s, n_loc, 2))
            ug = jnp.concatenate(ug, axis=-1).reshape(m0, -1)
            up = gather_rows_coherent(ug, film_idx)[None]
            u1 = up[..., 0:1]
            u2 = up[..., 1:3]
            u_nee = up[..., 3:5] if cfg.nee else None
        wi = sg(bsdf.sample_dirs(blob, u1[..., 0], u2, wo, nrm))
        if cfg.nee:
            wi_e, pdf_e = em.sample_dir(env_sampler, u_nee)
            # both marches of the vertex in one fused kernel
            hit, shadowed = do_pair(pos, wi, wi_e)
            rec_wi_e = wi_e.astype(jnp.bfloat16)
            rec_pdf_e = pdf_e.astype(jnp.bfloat16)
            uv_e = em.bilinear_coords(wi_e, eh, ew)
        else:
            shadowed = jnp.zeros(wi.shape[:-1], bool)
            rec_wi_e = None
            rec_pdf_e = None
            uv_e = None
            hit = do_march(pos, wi)
        # pdf of the envmap strategy at the lobe direction (BSDF-side MIS
        # weight) — detached, so computed here where the CDF tables'
        # (…, W) intermediates are forward-transients, never checkpoint
        # residuals (they were the 1 GB buffers that OOM'd 1024²)
        rec_pdf_at = (em.pdf_dir(env_sampler, wi).astype(jnp.bfloat16)
                      if cfg.nee else None)
        # the lobe direction is a RECORD too: the shade pass must attach
        # the recorded hit/pdf_at to the direction the trace actually
        # marched, not to a re-derivation from bf16-rounded replayed rows
        # (advisor round-2 finding: silhouette-edge bias); recording it
        # also deletes the shade-side sample_dirs recompute entirely
        rec_wi = wi.astype(jnp.bfloat16)

        # bilinear tap coords of both emitter fetches (NEE radiance at
        # wi_e, miss radiance at wi): recording them here removes every
        # atan2/arccos from the shade pass AND from its checkpoint
        # recompute in the backward — the trace already paid the
        # transcendental for pdf_dir. int16 texel + bf16 fraction
        # (the fraction quantization matches the one-hot path's bf16
        # weight quantization).
        uv_b = em.bilinear_coords(wi, eh, ew)
        if cfg.nee:
            rec_uvi = jnp.stack([uv_e[0], uv_e[1], uv_b[0], uv_b[1]],
                                axis=-1).astype(jnp.int16)
            rec_uvf = jnp.stack([uv_e[2], uv_e[3], uv_b[2], uv_b[3]],
                                axis=-1).astype(jnp.bfloat16)
        else:
            rec_uvi = jnp.stack([uv_b[0], uv_b[1]],
                                axis=-1).astype(jnp.int16)
            rec_uvf = jnp.stack([uv_b[2], uv_b[3]],
                                axis=-1).astype(jnp.bfloat16)

        if fused:
            # the shade kernel's packed inputs, assembled ONCE here. The
            # MARCH chain stays the exact f32 lobe direction (identical
            # traversal to the generic trace — a bf16-rotated continuation
            # ray can hit a different pixel near silhouettes).
            win = rec_wi.astype(jnp.float32)
            win = win / jnp.maximum(
                jnp.linalg.norm(win, axis=-1, keepdims=True), 1e-9)
            gate_nee = (base_alive & ~shadowed).astype(jnp.float32)
            gate_miss = (base_alive & ~hit.hit).astype(jnp.float32)
            tgt = win.shape[:-1]
            # r5 record slimming (the bytes that fit replay records at
            # 1024²×64spp, opt/plan.py): the shading normal rides f16 —
            # 11 mantissa bits, an ~8× tighter rounding than bf16 (whose
            # lone-normal rounding inflated the roughness grad L1 ~15×
            # through dGGX/dρ, measured r4) at half the f32 bytes — and
            # the wo plane is NOT recorded: the shade derives it from the
            # previous bounce's win record (b=0: the primary state it
            # already recomputes), −6 B/path-vertex each.
            rec_nrmf = jnp.broadcast_to(nrm, tgt + (3,)).astype(jnp.float16)
            rec_aux = jnp.concatenate(
                [win, gate_nee[..., None], gate_miss[..., None]],
                axis=-1).astype(jnp.bfloat16)
            rec_recb = jnp.concatenate(
                [rec_pdf_e, rec_pdf_at, rec_wi_e, rec_uvf,
                 rec_uvi.astype(jnp.bfloat16)], axis=-1).astype(jnp.bfloat16)
            records.append((shadowed, hit.hit, hit.idx, rec_blob, rec_nrmf,
                            None, None, None, None, None, None,
                            rec_aux, rec_recb, extras))
        else:
            records.append((shadowed, hit.hit, hit.idx, rec_blob, rec_nrm,
                            rec_wi_e, rec_pdf_e, rec_pdf_at, rec_wi,
                            rec_uvi, rec_uvf, None, None, extras))

        if do_compact and b < cfg.max_depth - 2:
            # stable-partition the live rays (hit ∧ alive) of this bounce;
            # bounce b+1 runs on the compacted prefix only. Pull the
            # surviving rays' continuation state through in ONE coherent
            # span gather: [vertex idx | film hi/lo | lobe dir].
            alive = hit.hit & base_alive
            cap = _caps_abs(b + 1)
            sel, count = compact_sel(alive.reshape(-1), cap)
            if film_idx is None:
                film_src = jnp.broadcast_to(
                    jnp.arange(m0, dtype=jnp.int32).reshape(s, n_loc),
                    (s, n_loc))
            else:
                film_src = film_idx[None]
            f_hi, f_lo = _f32_exact_split(film_src)
            # the continuation MARCH direction is always the exact f32
            # lobe direction (identical traversal in fused and generic
            # modes); fused mode additionally derives the shade's wo
            # chain from the gathered rows (bf16 is elementwise, so
            # bf16(gathered wi) == gathered rec_wi)
            pack_src = jnp.concatenate(
                [hit.idx.astype(jnp.float32)[..., None],
                 f_hi[..., None], f_lo[..., None], wi], axis=-1)
            pack = gather_rows_coherent(pack_src.reshape(-1, 6), sel)
            idx = pack[:, 0].astype(jnp.int32)[None]          # (1, cap)
            film_idx = _f32_exact_join(pack[:, 1], pack[:, 2])  # (cap,)
            wi_g = pack[None, :, 3:6]
            wo = -wi_g
            base_alive = (jnp.arange(cap, dtype=jnp.int32)
                          < count)[None]                       # (1, cap)
            pending = (sel, count, idx[0], film_idx)
        else:
            idx = hit.idx
            wo = -wi
            if fused:
                # a dead ray stays dead — the packed gates of later
                # bounces depend on this alive chain
                base_alive = base_alive & hit.hit
    return tuple(records)


def _shade_chunk(key, records, cfg: RenderConfig, cam: Camera,
                 gbuf: GBuffer, mats: Materials, envmap, bsdf=None,
                 film=None):
    """Replay pass: recompute the (identical, same-key) sampling decisions
    and evaluate the differentiable radiance using the trace records for
    all visibility. Everything expensive for AD lives here; the whole
    function is cheap to recompute, so it sits under jax.checkpoint."""
    h, w = gbuf.dist.shape
    n = h * w
    s = cfg.chunk

    if bsdf is None:
        from materialist_tpu.render import bsdf as bsdf_mod
        bsdf = bsdf_mod.disney(mats)

    sg = jax.lax.stop_gradient
    nrm_table = sg(gbuf.normal_geo.reshape(n, 3))
    off, n_rows = _film_base(film, h, w)
    n_loc = n_rows * w

    idx = _primary_idx(key, cfg, h, w, s, film)
    wo = jnp.broadcast_to(_slice_rows(gbuf.wo.reshape(n, 3), off, n_loc),
                          (s, n_loc, 3))
    alive = jnp.broadcast_to(_slice_rows(gbuf.valid.reshape(n), off, n_loc),
                             (s, n_loc))
    throughput = jnp.ones((s, n_loc, 3), jnp.float32)
    radiance = jnp.zeros((s, n_loc, 3), jnp.float32)

    if cfg.sky_background:
        view_dir = -_slice_rows(gbuf.wo.reshape(n, 3), off, n_loc)
        sky = em.lookup_bilinear(envmap, view_dir)
        radiance = radiance + jnp.where(
            _slice_rows(gbuf.valid.reshape(n), off, n_loc)[None, :, None],
            0.0, sky[None])

    identity0 = bsdf.table is not None
    # fused Pallas shade-bounce path: the entire per-vertex radiance math
    # (2 Disney evals + 2 VMEM emitter fetches + MIS + updates) in one
    # kernel pass, adjoint included (ops/pallas/shadebounce.py). Covers
    # the production inverse configuration; everything else (large
    # emitters, custom BSDFs, nee=False, blob normals) shades through the
    # generic XLA formulation below.
    from materialist_tpu.ops.pallas import shadebounce as _sb
    use_fused = _fused_shade_eligible(cfg, bsdf, envmap)
    m0 = s * n_loc
    film_rad = None   # (m0, 3) accumulator for compacted-bounce radiance
    for b in range(cfg.max_depth - 1):
        (shadowed, hit_ok, hit_idx, rec_blob, rec_nrm,
         rec_wi_e, rec_pdf_e, rec_pdf_at, rec_wi,
         rec_uvi, rec_uvf, rec_aux, rec_recb, extras) = records[b]
        # packed fused-shade records: the trace already assembled the
        # kernel's detached input planes (bf16), so this pass — and its
        # checkpoint recompute in the backward — is gather + kernel call,
        # no per-bounce packing glue
        packed = rec_aux is not None

        if extras is not None:
            # wavefront compaction (trace recorded how this bounce's
            # arrays were formed): pull the throughput chain through the
            # stable partition with a coherent differentiable gather; the
            # other inputs are reads of the compacted records
            from materialist_tpu.ops.pallas.rowops import (
                gather_coherent_diff, gather_rows_coherent,
                scatter_add_coherent_diff)
            sel, count, vtx_idx, film_pos = extras
            cap = sel.shape[0]
            throughput = gather_coherent_diff(
                throughput.reshape(-1, 3), sel)[None]          # (1, cap, 3)
            idx = vtx_idx[None]
            if not packed:
                # incoming direction exactly as the uncompacted shade
                # derives it: the PREVIOUS bounce's bf16 lobe record,
                # normalized after the round trip, pulled through the
                # partition (detached). (Packed records carry wo inside
                # rec_aux — trace gathered it through the same partition.)
                wi_prev = gather_rows_coherent(
                    records[b - 1][8].astype(jnp.float32).reshape(-1, 3),
                    sel)
                wi_prev = wi_prev / jnp.maximum(
                    jnp.linalg.norm(wi_prev, axis=-1, keepdims=True), 1e-9)
                wo = -wi_prev[None]
            alive = (jnp.arange(cap, dtype=jnp.int32) < count)[None]
            if film_rad is None:
                film_rad = jnp.zeros((m0, 3), jnp.float32)

        if b == 0 and identity0 and cfg.film_jitter > 0.0:
            # continuous film AA (same key as trace ⇒ identical state);
            # the material adjoint is still the broadcast sample-sum
            nrm_geo, _, wo, valid0 = _primary_state(key, cfg, cam, gbuf, s,
                                                    film)
            blob = _slice_rows(bsdf.table, off, n_loc)
            alive = alive & valid0
        elif b == 0 and identity0:
            # identity gather at the primary bounce (a differentiable
            # contiguous row slice under px sharding): adjoint is a sum
            # over the sample axis, not a scatter-add
            blob = _slice_rows(bsdf.table, off, n_loc)
            nrm_geo = _slice_rows(nrm_table, off, n_loc)
        elif rec_blob is not None and bsdf.gather_reuse is not None:
            # rows already fetched by the trace pass: free forward,
            # scatter-add adjoint into the material table
            blob = bsdf.gather_reuse(idx, rec_blob.astype(jnp.float32))
            nrm_geo = (rec_nrm.astype(jnp.float32)
                       if rec_nrm is not None else None)
        else:
            # record-light path: re-fetch the rows (span-binned kernel,
            # scatter-add adjoint) — ~22 B/path-vertex less record HBM,
            # the difference that fits 1024²×64spp with cached records
            blob = bsdf.gather(idx)
            if packed:
                nrm_geo = None   # inside rec_aux
            else:
                from materialist_tpu.ops.pallas.rowops import row_gather
                nrm_geo = row_gather(nrm_table, idx, exact=False)
        if packed:
            nrm = None           # inside rec_aux
        elif cfg.use_mesh_normal:
            nrm = nrm_geo
        else:
            nm = blob[..., 5:8]
            nrm = nm / jnp.maximum(
                jnp.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)

        if use_fused or packed:
            if packed:
                nrmf = rec_nrm           # f16 normal record (slot 4);
                #                          _to_planes casts to f32 in VMEM
                tgt = rec_aux.shape[:-1]
                # wo is not recorded (r5 record slimming): derive the
                # shade's -win chain from the PREVIOUS bounce's win record
                # — for compacted bounces pulled through the same stable
                # partition the trace used; for b=0 the primary wo (the
                # film-jitter branch above already recomputed it when AA
                # is on). One extra bf16 round-trip + renormalize vs the
                # r4 recorded plane — the same order as the bf16 storage
                # rounding itself (test_shadebounce tolerances).
                if extras is not None:
                    wprev = gather_rows_coherent(
                        records[b - 1][11][..., 0:3].astype(
                            jnp.float32).reshape(-1, 3), sel)[None]
                elif b > 0:
                    wprev = records[b - 1][11][..., 0:3].astype(jnp.float32)
                else:
                    wprev = None
                if wprev is None:
                    wo_d = jnp.broadcast_to(wo, tgt + (3,))
                else:
                    wo_d = -(wprev / jnp.maximum(jnp.linalg.norm(
                        wprev, axis=-1, keepdims=True), 1e-9))
                auxf = jnp.concatenate(
                    [wo_d.astype(jnp.bfloat16), rec_aux], axis=-1)
                recb = rec_recb
            else:
                wi_raw = rec_wi.astype(jnp.float32)
                win = wi_raw / jnp.maximum(
                    jnp.linalg.norm(wi_raw, axis=-1, keepdims=True), 1e-9)
                tgt = win.shape[:-1]
                gate_nee = (alive & ~shadowed).astype(
                    jnp.float32)[..., None]
                gate_miss = (alive & ~hit_ok).astype(jnp.float32)[..., None]
                nrmf = jnp.broadcast_to(nrm, tgt + (3,)).astype(jnp.float32)
                auxf = jnp.concatenate([
                    jnp.broadcast_to(wo, tgt + (3,)), win,
                    jnp.broadcast_to(gate_nee, tgt + (1,)),
                    jnp.broadcast_to(gate_miss, tgt + (1,))], axis=-1)
                recb = jnp.concatenate([
                    rec_pdf_e, rec_pdf_at, rec_wi_e, rec_uvf,
                    rec_uvi.astype(jnp.bfloat16)],
                    axis=-1).astype(jnp.bfloat16)
            blob5 = jnp.broadcast_to(blob[..., :5], tgt + (5,))
            throughput, rad_delta = _sb.shade_bounce_fused(
                envmap, blob5, jnp.broadcast_to(throughput, tgt + (3,)),
                nrmf, auxf, recb)
            if extras is not None:
                # compacted bounce: contributions return to their film
                # slots through a coherent differentiable scatter-add
                # (padding rows carry zero — their gates are dead)
                film_rad = film_rad + scatter_add_coherent_diff(
                    m0, rad_delta.reshape(-1, 3), film_pos)
            else:
                radiance = radiance + rad_delta
            alive = alive & hit_ok
            idx = hit_idx
            if not packed:
                wo = -win
            continue

        # ---- NEE: recorded envmap sample decisions + recorded shadow
        # (wi_e/pdf_e/pdf_at come from the trace pass — they are detached
        # estimator decisions, and recomputing them here would drag the
        # CDF tables' (…, W) intermediates into the checkpoint remat)
        if cfg.nee:
            wi_e = rec_wi_e.astype(jnp.float32)
            pdf_e = rec_pdf_e.astype(jnp.float32)
            le = em.lookup_bilinear_at(
                envmap, rec_uvi[..., 0].astype(jnp.int32),
                rec_uvi[..., 1].astype(jnp.int32),
                rec_uvf[..., 0].astype(jnp.float32),
                rec_uvf[..., 1].astype(jnp.float32))
            f_e, pdf_b_at_e = bsdf.eval(blob, idx, wi_e, wo, nrm)
            w_mis = pdf_e / (pdf_e + sg(pdf_b_at_e) + 1e-9)
            contrib = throughput * f_e / (pdf_e + 1e-9) * w_mis * le
            gate = (alive & ~shadowed)[..., None]
            contrib_b = jnp.where(gate, contrib, 0.0)
        else:
            contrib_b = 0.0

        # ---- BSDF lobe: the RECORDED trace direction (normalized back to
        # unit length after the bf16 round trip) — the hit/pdf_at records
        # attach to exactly this direction
        wi = rec_wi.astype(jnp.float32)
        wi = wi / jnp.maximum(
            jnp.linalg.norm(wi, axis=-1, keepdims=True), 1e-9)
        f_b, pdf_b = bsdf.eval(blob, idx, wi, wo, nrm)
        pdf_b = sg(pdf_b)
        weight = bsdf.weight(f_b, pdf_b)

        uv_off = 2 if cfg.nee else 0
        le_miss = em.lookup_bilinear_at(
            envmap, rec_uvi[..., uv_off].astype(jnp.int32),
            rec_uvi[..., uv_off + 1].astype(jnp.int32),
            rec_uvf[..., uv_off].astype(jnp.float32),
            rec_uvf[..., uv_off + 1].astype(jnp.float32))
        if cfg.nee:
            pdf_e_at_wi = rec_pdf_at.astype(jnp.float32)
            w_mis_b = pdf_b / (pdf_b + pdf_e_at_wi + 1e-9)
        else:
            w_mis_b = 1.0
        miss_gate = (alive & ~hit_ok)[..., None]
        contrib_b = contrib_b + jnp.where(
            miss_gate, throughput * weight * w_mis_b * le_miss, 0.0)
        if extras is not None:
            film_rad = film_rad + scatter_add_coherent_diff(
                m0, contrib_b.reshape(-1, 3), film_pos)
        else:
            radiance = radiance + contrib_b

        # advance the path (snap to the hit pixel's G-buffer position)
        throughput = throughput * weight
        alive = alive & hit_ok
        idx = hit_idx
        wo = -wi

    if film_rad is not None:
        radiance = radiance + film_rad.reshape(s, n_loc, 3)
    img = jnp.mean(radiance, axis=0)  # mean over the chunk's samples
    return jnp.nan_to_num(img, nan=0.0, posinf=0.0, neginf=0.0).reshape(
        n_rows, w, 3)


def trace_step_records(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                       mats: Materials, envmap, bsdf=None, film=None,
                       keys=None):
    """Decision/visibility pass for a FULL step: per-chunk trace records.

    Nothing in the result is differentiable (bool/int visibility plus bf16
    replayed rows and directions), so the records can be computed once,
    cached across host-level gradient-accumulation passes, and sharded
    freely — the expensive marches and row-gathers never run again.

    The chunks are serialized with an optimization_barrier chain: without
    it XLA schedules every chunk's trace working set (~3 GB each at 512²
    ×16spp) concurrently and the step OOMs at high res × spp. Only the
    (small) records persist across chunks. NOTE: the barrier must NOT
    alter ``keys[i]`` semantics — trace and shade derive identical PRNG
    decisions from the same key and must see the bitwise-same value
    (optimization_barrier is the identity, so this holds).
    """
    n_chunks = max(cfg.spp // cfg.chunk, 1)
    if keys is None:
        keys = jax.random.split(key, n_chunks)
    out = []
    anchor = None
    for i in range(n_chunks):
        k = keys[i]
        if anchor is not None:
            k, _ = jax.lax.optimization_barrier((k, anchor))
        recs = _trace_chunk_paths(k, cfg, cam, gbuf, mats, envmap, bsdf,
                                  film)
        out.append(recs)
        anchor = recs[0][0]    # pin chunk i+1 behind chunk i's records
    return tuple(out)


def compact_cap_utilization(records):
    """Max live-count / cap per compacted bounce, extracted from trace
    records (ADVICE r4: compact_sel computes the true alive count but it
    was never surfaced — a saturated cap silently drops live rays, a
    systematic dimming bias). Returns a list of (bounce, frac) jnp
    scalars; callers fetch/log them at whatever cadence they print.

    Works on a single trace_step_records result or on the group-stacked
    pytree opt/step.py's trace_all produces (leading scan axes reduce
    with max)."""
    out = []
    chunks = records if isinstance(records, tuple) else (records,)
    for recs_chunk in chunks:
        for b, rec in enumerate(recs_chunk):
            extras = rec[-1]
            if extras is None:
                continue
            sel, count = extras[0], extras[1]
            cap = sel.shape[-1]
            frac = jnp.max(count).astype(jnp.float32) / float(cap)
            out.append((b, frac))
    return out


def probe_compact_caps(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                       mats: Materials, envmap, bsdf=None,
                       margin: float = 1.3):
    """Measure per-bounce alive fractions on ONE chunk and return
    compact_caps sized with `margin` (rounded up to 1/16ths so cap sizes
    — and therefore compiled programs — are stable across nearby scenes).

    The alive fraction depends on geometry (static during an optimization)
    and weakly on roughness (lobe directions); the margin absorbs the
    drift as materials evolve. Live rays beyond a cap degrade to 'dead'
    (dropped contribution), so a blown margin degrades variance, never
    correctness of what is accumulated."""
    cfg_p = cfg._replace(spp=min(cfg.chunk, cfg.spp), compact_caps=())
    recs = jax.jit(lambda k: trace_step_records(
        k, cfg_p, cam, gbuf, mats, envmap, bsdf))(key)[0]
    h, w = gbuf.dist.shape
    valid = gbuf.valid.reshape(-1)[None]
    caps = []
    alive = jnp.broadcast_to(valid, recs[0][1].shape)
    for b in range(cfg.max_depth - 2):
        alive = alive & recs[b][1]
        frac = float(jnp.mean(alive.astype(jnp.float32)))
        cap = min(max(-(-frac * margin * 16 // 1), 1) / 16.0, 1.0)
        caps.append(cap)
    return tuple(caps)


def shade_from_records(key, records, cfg: RenderConfig, cam: Camera,
                       gbuf: GBuffer, mats: Materials, envmap, bsdf=None,
                       film=None, keys=None):
    """Differentiable radiance from precomputed trace records.

    Each chunk's shade sits under jax.checkpoint (the backward pass
    re-materializes one chunk's shade at a time), and the accumulation is
    barrier-chained: the transposed barrier serializes the backward remats
    the same way the forward chain serializes the traces (a plain sum
    hands every chunk its cotangent at once and XLA then schedules all
    checkpoint remats concurrently — the other half of the high-res OOM).
    """
    n_chunks = max(cfg.spp // cfg.chunk, 1)
    if keys is None:
        keys = jax.random.split(key, n_chunks)

    shade = jax.checkpoint(
        lambda k, recs: _shade_chunk(k, recs, cfg, cam, gbuf, mats,
                                     envmap, bsdf, film))

    h, w = gbuf.dist.shape
    _, n_rows = _film_base(film, h, w)
    total = jnp.zeros((n_rows, w, 3), jnp.float32)
    for i in range(n_chunks):
        chunk_img = shade(keys[i], records[i])
        total = jax.lax.optimization_barrier(total + chunk_img) \
            if n_chunks > 1 else total + chunk_img
    return total / n_chunks


def render_with_bsdf(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                     mats: Materials, envmap, bsdf=None, film=None,
                     keys=None):
    """Render with an arbitrary BSDF closure set (render/bsdf.py).

    Path-replay structure: a non-differentiable trace resolves all
    visibility and stochastic decisions into compact per-chunk records,
    then a checkpointed shade computes the differentiable radiance. The
    backward pass recomputes only the shade — marches and row-gathers run
    exactly once per step.
    """
    records = trace_step_records(key, cfg, cam, gbuf, mats, envmap, bsdf,
                                 film, keys)
    return shade_from_records(key, records, cfg, cam, gbuf, mats, envmap,
                              bsdf, film, keys)


@functools.partial(jax.jit, static_argnames=("cfg", "cam"))
def render(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
           mats: Materials, envmap):
    """Render the scene: MC estimate with cfg.spp samples per pixel.

    Differentiable w.r.t. ``mats`` and ``envmap`` (the reference's
    Differentiable params, mi_plugin.py:1464-1469 + emitter.data).
    """
    return render_with_bsdf(key, cfg, cam, gbuf, mats, envmap)
