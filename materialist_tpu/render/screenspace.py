"""Screen-space ray marching against the depth heightfield.

This is the TPU-native replacement for Mitsuba's mesh ray tracing: because
the scene geometry is exactly the depth-derived heightfield (the reference's
mesh is a function of the depth map, SURVEY.md §7), secondary visibility can
be resolved by marching rays in the depth buffer — an O(K)-gather loop with
static shapes that jits cleanly, instead of a BVH.

All marching runs under stop_gradient in the shader: geometry is fixed
during material/envmap optimization (only shape.bsdf.{a,r,m,n} and
emitter.data are Differentiable in the reference, mi_plugin.py:1464-1469),
so no backward memory is spent on the K marching steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialist_tpu.camera import Camera


class Hit(NamedTuple):
    hit: jnp.ndarray      # (...,) bool
    idx: jnp.ndarray      # (...,) int32 flat pixel index of the hit
    t: jnp.ndarray        # (...,) ray parameter at the hit
    exited: jnp.ndarray   # (...,) ray left the view frustum (envmap miss)


def _sample_heightfield(dist_flat, valid_flat, cam: Camera, q):
    """Depth-buffer fetch at the projection of world points q (..., 3).

    Returns (surface_dist, pixel_idx, inside_screen).
    """
    uv = cam.project(q)
    u = uv[..., 0]
    v = uv[..., 1]
    # gather index = floor(u) + floor(v)*W (mi_plugin.py:1378-1381)
    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = jnp.floor(v + 0.5).astype(jnp.int32)
    inside = (ui >= 0) & (ui < cam.width) & (vi >= 0) & (vi < cam.height)
    idx = jnp.clip(vi, 0, cam.height - 1) * cam.width + jnp.clip(
        ui, 0, cam.width - 1)
    d = dist_flat[idx]
    ok = inside & valid_flat[idx]
    return d, idx, ok


def march(cam: Camera, dist_map, valid_map, origin, direction,
          n_steps: int = 24, n_refine: int = 5, t_min_frac: float = 2e-3,
          t_max_frac: float = 3.0, bias_frac: float = 4e-3,
          interval_frac: float = 2.0, vectorized: bool = False) -> Hit:
    """March rays from surface points through the depth heightfield.

    Args:
        cam: camera (screen projection).
        dist_map: (H, W) per-pixel -z distance of the geometry.
        valid_map: (H, W) bool geometry mask.
        origin: (..., 3) world-space ray origins (on the surface).
        direction: (..., 3) unit world-space directions.
        n_steps: fixed number of exponential marching steps (static).
        n_refine: bisection steps after the first crossing (static).
        t_min_frac/t_max_frac: march interval as a fraction of the scene
            scale (max distance) — scale-free so arbitrary depth units work.
        bias_frac: surface-acne bias as a fraction of local distance.
        interval_frac: a crossing counts as a hit only if the ray's depth
            excess at first detection is below this fraction of the local
            distance (thickness heuristic for depth discontinuities — the
            reference's mesh has open boundaries at occlusion edges,
            mesh_recon.py:126-175, which rays pass through).
    Returns: Hit pytree (all under the caller's stop_gradient).
    """
    scene_scale = jnp.maximum(jnp.max(dist_map), 1e-6)
    t_lo = t_min_frac * scene_scale
    t_hi = t_max_frac * scene_scale
    ratio = (t_hi / t_lo) ** (1.0 / max(n_steps - 1, 1))

    dist_flat = dist_map.reshape(-1)
    valid_flat = valid_map.reshape(-1)

    if vectorized:
        return _march_vectorized(cam, dist_flat, valid_flat, origin,
                                 direction, n_steps, n_refine, t_lo, ratio,
                                 bias_frac, interval_frac)

    batch_shape = origin.shape[:-1]
    f32 = dict(dtype=jnp.float32)

    def ray_excess(t):
        """positive ⇒ ray point is behind the surface at its pixel."""
        q = origin + t[..., None] * direction
        ray_d = -q[..., 2]
        surf_d, idx, ok = _sample_heightfield(dist_flat, valid_flat, cam, q)
        bias = bias_frac * surf_d
        return jnp.where(ok, ray_d - surf_d - bias, -jnp.inf), idx, ok, ray_d

    # NOTE: statically unrolled — a gather inside lax.fori_loop/scan costs
    # ~15 ms *per iteration* on this backend vs ~0.03 ms unrolled (kernel
    # re-dispatch per iteration); unrolling is a ~200× win for the march.
    found = jnp.zeros(batch_shape, bool)
    t_before = jnp.full(batch_shape, t_lo, **f32)
    t_cross = jnp.zeros(batch_shape, **f32)
    excess_cross = jnp.full(batch_shape, -jnp.inf, **f32)
    exited = jnp.zeros(batch_shape, bool)
    for i in range(n_steps):
        t = jnp.full(batch_shape, t_lo * ratio ** i, **f32)
        excess, _, ok, ray_d = ray_excess(t)
        exited_now = (~ok) | (ray_d <= 0.0)
        crossing = (excess > 0.0) & ~found & ~exited
        t_cross = jnp.where(crossing, t, t_cross)
        excess_cross = jnp.where(crossing, excess, excess_cross)
        found = found | crossing
        exited = exited | (exited_now & ~found)
        t_before = jnp.where(found | exited, t_before, t)

    # Bisection refine within [t_before, t_cross] (unrolled, same reason).
    lo = t_before
    hi = jnp.where(found, t_cross, t_before)
    for _ in range(n_refine):
        mid = 0.5 * (lo + hi)
        excess, _, ok, _ = ray_excess(mid)
        behind = (excess > 0.0) & ok
        lo = jnp.where(behind, lo, mid)
        hi = jnp.where(behind, mid, hi)
    t_hit = jnp.where(found, hi, t_cross)

    excess_hit, idx_hit, ok_hit, _ = ray_excess(t_hit)
    # thickness heuristic: reject crossings that jump far behind the
    # surface. Tested on the REFINED excess (like the mip/fused impls'
    # fine-step excess): for a true hit the bisection converges onto the
    # surface (excess → +0), while a silhouette pass-through converges to
    # the depth cliff, where the excess IS the gap behind the sheet.
    # (r4: with n_refine == 0 this degrades to the coarse-step excess.)
    q = origin + t_hit[..., None] * direction
    local = jnp.maximum(-q[..., 2], 1e-6)
    thin = jnp.where(found, excess_hit, excess_cross) < interval_frac * local
    hit = found & thin & ok_hit
    return Hit(hit=hit, idx=idx_hit, t=t_hit, exited=exited | ~hit)


def _march_vectorized(cam: Camera, dist_flat, valid_flat, origin, direction,
                      n_steps, n_refine, t_lo, ratio, bias_frac,
                      interval_frac) -> Hit:
    """Step-parallel marching: all K sample points are evaluated in a few
    large fused kernels (K on the trailing lane axis), and the first
    crossing is found with an argmax reduction — ~K× fewer kernel launches
    than the sequential fori_loop, which dominates wall-clock on TPU.
    """
    def excess_at(t):
        """t: (..., K) → (excess, idx, ok, ray_d), all (..., K)."""
        q = origin[..., None, :] + t[..., :, None] * direction[..., None, :]
        ray_d = -q[..., 2]
        surf_d, idx, ok = _sample_heightfield(dist_flat, valid_flat, cam, q)
        excess = jnp.where(ok, ray_d - surf_d - bias_frac * surf_d, -jnp.inf)
        return excess, idx, ok, ray_d

    k = jnp.arange(n_steps, dtype=jnp.float32)
    ts = t_lo * ratio ** k                                  # (K,)
    t_b = jnp.broadcast_to(ts, origin.shape[:-1] + (n_steps,))
    excess, idx, ok, ray_d = excess_at(t_b)

    exited_step = (~ok) | (ray_d <= 0.0)
    crossed = (excess > 0.0) & ~exited_step
    # mask out steps after the first exit: cumulative or
    exited_before = jnp.cumsum(exited_step.astype(jnp.int32), axis=-1) \
        - exited_step.astype(jnp.int32) > 0
    crossed = crossed & ~exited_before

    any_cross = jnp.any(crossed, axis=-1)
    first = jnp.argmax(crossed, axis=-1)                    # (...,)
    t_cross = jnp.take_along_axis(t_b, first[..., None], -1)[..., 0]
    excess_cross = jnp.take_along_axis(excess, first[..., None], -1)[..., 0]
    t_before = jnp.where(first > 0, t_cross / ratio, t_lo)

    # vectorized refinement: n_refine uniform substeps in (t_before, t_cross]
    if n_refine > 0:
        frac = (jnp.arange(n_refine, dtype=jnp.float32) + 1.0) / n_refine
        t_ref = t_before[..., None] + (t_cross - t_before)[..., None] * frac
        e_r, idx_r, ok_r, _ = excess_at(t_ref)
        crossed_r = (e_r > 0.0) & ok_r
        any_r = jnp.any(crossed_r, axis=-1)
        first_r = jnp.argmax(crossed_r, axis=-1)
        pick = jnp.where(any_r, first_r, n_refine - 1)
        t_hit = jnp.take_along_axis(t_ref, pick[..., None], -1)[..., 0]
        idx_hit = jnp.take_along_axis(idx_r, pick[..., None], -1)[..., 0]
        e_hit = jnp.take_along_axis(e_r, pick[..., None], -1)[..., 0]
        ok_hit = jnp.take_along_axis(ok_r, pick[..., None], -1)[..., 0]
    else:
        t_hit = t_cross
        idx_hit = jnp.take_along_axis(idx, first[..., None], -1)[..., 0]
        e_hit = excess_cross
        ok_hit = jnp.take_along_axis(ok, first[..., None], -1)[..., 0]

    q = origin + t_hit[..., None] * direction
    local = jnp.maximum(-q[..., 2], 1e-6)
    # refined-excess thin test (see the sequential variant): e_hit is the
    # excess at the first refined substep crossing — small for a true
    # surface hit, ≈ the gap behind the sheet for a pass-through
    thin = (e_hit if n_refine > 0 else excess_cross) < interval_frac * local
    hit = any_cross & thin & ok_hit & (e_hit > -jnp.inf)
    exited = jnp.any(exited_step & ~exited_before, axis=-1) & ~hit
    return Hit(hit=hit, idx=idx_hit, t=t_hit, exited=exited | ~hit)


def occluded(cam: Camera, dist_map, valid_map, origin, direction,
             n_steps: int = 16, **kw) -> jnp.ndarray:
    """Boolean shadow query for NEE rays. With a tight thickness bound
    (interval_frac < 1) the thin test needs the refined excess — the
    coarse-step excess of a true wall hit easily exceeds 5% of the view
    distance — so a couple of refinement steps run; otherwise coarse-only
    (the historical behavior, where thin never fires anyway)."""
    n_refine = 2 if kw.get("interval_frac", 2.0) < 1.0 else 0
    h = march(cam, dist_map, valid_map, origin, direction,
              n_steps=n_steps, n_refine=n_refine, **kw)
    return h.hit


# ---------------------------------------------------------------------------
# MXU-gather mip march: the production TPU path.
#
# XLA's random gather costs ~8 ns/lookup on TPU, which made the exact
# march above gather-bound (~1 s per (8, 512²) ray batch). This variant
# marches coarsely against a min-depth mip (tiny table ⇒ the one-hot MXU
# lookup in ops/pallas/gather.py is ~free) and only touches the full-res
# heightfield for a handful of refinement substeps inside the first
# candidate interval. Geometry is fixed during optimization, so the mip
# is built once per scene.
# ---------------------------------------------------------------------------

def build_min_mip(dist_map, valid_map, factor: int = 4):
    """Min-depth mip with invalid texels excluded (large sentinel)."""
    h, w = dist_map.shape
    big = 1.0e30
    d = jnp.where(valid_map, dist_map, big)
    mip = d.reshape(h // factor, factor, w // factor, factor).min((1, 3))
    return mip


def build_fine_table(dist_map, valid_map, factor: int = 2):
    """Surface table for the fine pass: factor×factor *mean* depth over
    valid texels (invalid-only cells get the no-hit sentinel). factor 1
    returns the full-res sentinel table."""
    big = 1.0e30
    if factor == 1:
        return jnp.where(valid_map, dist_map, big)
    h, w = dist_map.shape
    v = valid_map.reshape(h // factor, factor, w // factor, factor)
    d = jnp.where(valid_map, dist_map, 0.0).reshape(
        h // factor, factor, w // factor, factor)
    cnt = v.sum((1, 3))
    mean = d.sum((1, 3)) / jnp.maximum(cnt, 1)
    return jnp.where(cnt > 0, mean, big)


def march_mip(cam: Camera, dist_map, valid_map, mip, origin, direction,
              n_steps: int = 24, fine_steps: int = 6,
              t_min_frac: float = 2e-3, t_max_frac: float = 3.0,
              bias_frac: float = 4e-3, interval_frac: float = 2.0,
              mip_factor: int = 4, shadow_only: bool = False,
              fine_table=None, fine_factor: int = 1) -> Hit:
    """Two-level march. Returns Hit like `march` (run under stop_gradient).

    Approximation vs the exact march: only the FIRST mip-candidate
    interval is refined; a false mip positive (possible near silhouettes,
    where the cell min is closer than the surface along the ray) resolves
    as a miss instead of continuing — an accepted bias, like the depth
    mesh itself (SURVEY.md §7).
    """
    from materialist_tpu.ops.pallas.gather import onehot_gather

    scene_scale = jnp.max(jnp.where(valid_map, dist_map, 0.0))
    scene_scale = jnp.maximum(scene_scale, 1e-6)
    t_lo = t_min_frac * scene_scale
    t_hi = t_max_frac * scene_scale
    ratio = (t_hi / t_lo) ** (1.0 / max(n_steps - 1, 1))

    h, w = dist_map.shape
    mh, mw = mip.shape
    batch = origin.shape[:-1]
    f32 = dict(dtype=jnp.float32)

    # single-channel fine table: invalid pixels get a huge sentinel depth
    # (ray can never be behind it ⇒ no crossing). The caller may supply a
    # reduced-resolution mean-depth table (fine_factor > 1): the surface
    # *test* coarsens while the hit pixel index stays full-res (it comes
    # from projection, not the table).
    if fine_table is None:
        fine_table = build_fine_table(dist_map, valid_map, fine_factor)
    fh, fw = fine_table.shape

    def project(q):
        uv = cam.project(q)
        ui = jnp.floor(uv[..., 0] + 0.5).astype(jnp.int32)
        vi = jnp.floor(uv[..., 1] + 0.5).astype(jnp.int32)
        inside = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        return ui, vi, inside

    # ---- coarse pass on the mip
    # A ray's own mip cell would trigger an immediate false candidate
    # (the cell min includes neighbors closer than the start point), which
    # would consume the single refined interval and turn real hits into
    # misses — exclude the starting cell from candidacy.
    ui0, vi0, _ = project(origin)
    start_cell = jnp.clip(vi0 // mip_factor, 0, mh - 1) * mw \
        + jnp.clip(ui0 // mip_factor, 0, mw - 1)

    # Track the first TWO rising-edge candidate intervals: a silhouette
    # cell can produce a false first candidate (cell min closer than the
    # surface along the ray); the second interval then carries the true
    # hit instead of turning it into a miss.
    prev_cand = jnp.zeros(batch, bool)
    edge_cnt = jnp.zeros(batch, jnp.int32)
    exited = jnp.zeros(batch, bool)
    t_prev = jnp.full(batch, t_lo, **f32)
    tb = [jnp.full(batch, t_lo, **f32) for _ in range(2)]
    tc = [jnp.full(batch, t_lo, **f32) for _ in range(2)]
    for i in range(n_steps):
        t = t_lo * ratio ** i
        q = origin + t * direction
        ray_d = -q[..., 2]
        ui, vi, inside = project(q)
        mi = jnp.clip(vi // mip_factor, 0, mh - 1) * mw \
            + jnp.clip(ui // mip_factor, 0, mw - 1)
        min_d = onehot_gather(mip, mi)
        candidate = inside & (ray_d > min_d * (1.0 - bias_frac)) \
            & (ray_d > 0.0) & (mi != start_cell) & ~exited
        rising = candidate & ~prev_cand
        for s in range(2):
            newk = rising & (edge_cnt == s)
            tb[s] = jnp.where(newk, t_prev, tb[s])
            tc[s] = jnp.where(newk, t, tc[s])
        edge_cnt = edge_cnt + rising.astype(jnp.int32)
        prev_cand = candidate
        exited = exited | (((~inside) | (ray_d <= 0.0)) & (edge_cnt == 0))
        t_prev = t

    found = edge_cnt > 0
    if shadow_only:
        return Hit(hit=found, idx=jnp.zeros(batch, jnp.int32),
                   t=tc[0], exited=exited | ~found)

    # ---- fine passes on the full heightfield over each interval
    # (window widened by one coarse step to catch mid-run crossings)
    hit = jnp.zeros(batch, bool)
    t_hit = tc[0]
    idx_hit = jnp.zeros(batch, jnp.int32)
    excess_hit = jnp.zeros(batch, **f32)
    frac = (jnp.arange(fine_steps, **f32) + 1.0) / fine_steps
    for s in range(2):
        lo_t = tb[s]
        hi_t = tc[s] * ratio
        gate = (edge_cnt > s) & ~hit
        for k in range(fine_steps):
            t = lo_t + (hi_t - lo_t) * frac[k]
            q = origin + t[..., None] * direction
            ray_d = -q[..., 2]
            ui, vi, inside = project(q)
            idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
            fidx = jnp.clip(vi // fine_factor, 0, fh - 1) * fw \
                + jnp.clip(ui // fine_factor, 0, fw - 1)
            surf_d = onehot_gather(fine_table, fidx)
            ok = inside & (surf_d < 1.0e29)
            excess = ray_d - surf_d - bias_frac * surf_d
            crossing = ok & (excess > 0.0) & gate & ~hit
            t_hit = jnp.where(crossing, t, t_hit)
            idx_hit = jnp.where(crossing, idx, idx_hit)
            excess_hit = jnp.where(crossing, excess, excess_hit)
            hit = hit | crossing

    q = origin + t_hit[..., None] * direction
    local = jnp.maximum(-q[..., 2], 1e-6)
    thin = excess_hit < interval_frac * local
    hit = hit & thin
    return Hit(hit=hit, idx=idx_hit, t=t_hit, exited=exited | ~hit)
