"""Fused screen-space march — single Pallas kernel per ray batch.

v2 design (v1 statically unrolled (1,128) lane groups; it compiled for
minutes and spent most issue slots on per-group scalar bookkeeping):

* rays are processed in (8, 128) vreg blocks — all projection/stepping
  arithmetic is full-width VPU work; only the table lookup decomposes to
  per-row composed gathers (a true 2-D gather of distinct (u, v) pairs
  cannot be expressed as two take_along_axis ops across rows);
* the coarse scan and the fine refinement are `lax.fori_loop`s, so the
  kernel body compiles once per loop instead of once per step (~30×
  smaller Mosaic program, seconds instead of minutes);
* the step scale t is a scalar carry (all rays share the exponential
  schedule), multiplied by `ratio` per iteration;
* the fine surface table is capped at 4 (8,128) planes (4096 texels —
  64×64 at 512², i.e. fine_factor 8) so the per-row plane-select chain
  stays short.

Traversal semantics match render/screenspace.py march_mip: exponential
coarse scan against a min-depth mip with the starting cell excluded,
first TWO rising-edge candidate intervals refined against the mean-depth
fine table, thickness-heuristic rejection of silhouette pass-throughs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialist_tpu.camera import Camera
from materialist_tpu.render.screenspace import Hit

BLOCK = 1024  # rays per grid step: one (8, 128) vreg block


def _mip_factor(h: int, w: int) -> int:
    """Largest power-of-two factor whose mip fits one (8,128) plane."""
    f = 1
    while (h // f) * (w // f) > 1024:
        f *= 2
    return f


def _fine_factor(h: int, w: int) -> int:
    """Factor whose fine table fits 4 planes (4096 texels)."""
    f = 1
    while (h // f) * (w // f) > 4096:
        f *= 2
    return f


def _lookup_block(planes_ref, n_planes, flat_idx):
    """(8,128) int32 flat idx → (8,128) f32 from an (n_planes·8, 128)
    plane stack. Row-wise composed vreg gathers (lane gather with the
    row's u broadcast, then sublane gather with v)."""
    plane_id = flat_idx // 1024
    within = flat_idx - plane_id * 1024
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


def _make_kernel(*, h, w, focal, cx, cy, n_steps, fine_steps, ratio,
                 bias_frac, interval_frac, fine_planes, shadow_only):
    mip_f = _mip_factor(h, w)
    fine_f = _fine_factor(h, w)
    mw = w // mip_f
    mh = h // mip_f
    fw = w // fine_f
    fh = h // fine_f

    def kernel(tlo_ref, o_ref, d_ref, mip_ref, fine_ref,
               hit_ref, idx_ref, t_ref):
        t_lo = tlo_ref[0, 0]
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]        # (8, 128)
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]

        def project(qx, qy, qz):
            inv = 1.0 / jnp.maximum(-qz, 1e-6)
            uf = cx + focal * qx * inv - 0.5
            vf = cy - focal * qy * inv - 0.5
            ui = jnp.floor(uf + 0.5).astype(jnp.int32)
            vi = jnp.floor(vf + 0.5).astype(jnp.int32)
            inside = ((ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
                      & (qz < 0.0))
            return ui, vi, inside

        ui0, vi0, _ = project(ox, oy, oz)
        start_cell = jnp.clip(vi0 // mip_f, 0, mh - 1) * mw \
            + jnp.clip(ui0 // mip_f, 0, mw - 1)

        # NOTE: carried masks are int32, not bool — Mosaic cannot legalize
        # scf.for with vector<8x128xi1> loop carries
        zeros_i = jnp.zeros((8, 128), jnp.int32)
        t_full = jnp.full((8, 128), 1.0, jnp.float32) * t_lo

        def coarse_body(i, carry):
            (t, prev_cand, edge_cnt, exited, t_prev,
             tb1, tc1, tb2, tc2) = carry
            qx = ox + t * dx
            qy = oy + t * dy
            qz = oz + t * dz
            ui, vi, inside = project(qx, qy, qz)
            mi = jnp.clip(vi // mip_f, 0, mh - 1) * mw \
                + jnp.clip(ui // mip_f, 0, mw - 1)
            min_d = _lookup_block(mip_ref, 1, mi)
            ray_d = -qz
            cand = inside & (ray_d > min_d * (1.0 - bias_frac)) \
                & (mi != start_cell) & (exited == 0)
            rising = cand & (prev_cand == 0)
            new1 = rising & (edge_cnt == 0)
            new2 = rising & (edge_cnt == 1)
            tb1 = jnp.where(new1, t_prev, tb1)
            tc1 = jnp.where(new1, t, tc1)
            tb2 = jnp.where(new2, t_prev, tb2)
            tc2 = jnp.where(new2, t, tc2)
            edge_cnt = edge_cnt + rising.astype(jnp.int32)
            exited = exited | ((~inside & (edge_cnt == 0))
                               .astype(jnp.int32))
            return (t * ratio, cand.astype(jnp.int32), edge_cnt, exited,
                    t, tb1, tc1, tb2, tc2)

        init = (t_lo, zeros_i, zeros_i, zeros_i, t_lo,
                t_full, t_full, t_full, t_full)
        (_, _, edge_cnt, exited, _, tb1, tc1, tb2, tc2) = \
            jax.lax.fori_loop(0, n_steps, coarse_body, init)

        found = edge_cnt > 0
        if shadow_only:
            hit_ref[:, :] = found.astype(jnp.float32)
            idx_ref[:, :] = zeros_i
            t_ref[:, :] = tc1
            return

        def fine_body(k, carry):
            hit, t_hit, idx_hit, excess_hit, local_hit = carry
            # interval 0 for k < fine_steps, interval 1 after
            second = k >= fine_steps
            lo_t = jnp.where(second, tb2, tb1)
            hi_t = jnp.where(second, tc2, tc1) * ratio
            # int-threshold compare, not where() on i1 vectors (Mosaic
            # cannot legalize arith.select with i1 vector operands)
            gate = edge_cnt > jnp.where(second, 1, 0)
            kk = jnp.where(second, k - fine_steps, k).astype(jnp.float32)
            frac = (kk + 1.0) / fine_steps
            t = lo_t + (hi_t - lo_t) * frac
            qx = ox + t * dx
            qy = oy + t * dy
            qz = oz + t * dz
            ui, vi, inside = project(qx, qy, qz)
            fidx = jnp.clip(vi // fine_f, 0, fh - 1) * fw \
                + jnp.clip(ui // fine_f, 0, fw - 1)
            surf = _lookup_block(fine_ref, fine_planes, fidx)
            ray_d = -qz
            ok = inside & (surf < 1.0e29)
            crossing = ok & (ray_d > surf * (1.0 + bias_frac)) \
                & gate & (hit == 0)
            full_idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
            t_hit = jnp.where(crossing, t, t_hit)
            idx_hit = jnp.where(crossing, full_idx, idx_hit)
            excess_hit = jnp.where(
                crossing, ray_d - surf * (1.0 + bias_frac), excess_hit)
            local_hit = jnp.where(crossing, ray_d, local_hit)
            return (hit | crossing.astype(jnp.int32), t_hit, idx_hit,
                    excess_hit, local_hit)

        ones_f = jnp.ones((8, 128), jnp.float32)
        hit_i, t_hit, idx_hit, excess_hit, local_hit = jax.lax.fori_loop(
            0, 2 * fine_steps, fine_body,
            (zeros_i, tc1, zeros_i, 0.0 * ones_f, ones_f))
        hit = hit_i > 0

        # thickness heuristic (matches march/march_mip,
        # screenspace.py:359-362): a crossing far behind the local surface
        # is a silhouette pass-through, not a hit
        thin = excess_hit < interval_frac * jnp.maximum(local_hit, 1e-6)
        hit = hit & thin
        hit_ref[:, :] = hit.astype(jnp.float32)
        idx_ref[:, :] = idx_hit
        t_ref[:, :] = t_hit

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_steps", "fine_steps", "shadow_only",
                     "t_min_frac", "t_max_frac", "bias_frac",
                     "interval_frac"))
def _march_fused_tpu(cam: Camera, mip, fine, t_lo, origin, direction,
                     n_steps: int, fine_steps: int,
                     shadow_only: bool, t_min_frac: float,
                     t_max_frac: float, bias_frac: float,
                     interval_frac: float):
    h, w = cam.height, cam.width
    ratio = (t_max_frac / t_min_frac) ** (1.0 / max(n_steps - 1, 1))

    def pad_planes(tbl):
        n = tbl.shape[0] * tbl.shape[1]
        planes = -(-n // 1024)
        flat = tbl.reshape(-1)
        if planes * 1024 - n:
            flat = jnp.pad(flat, (0, planes * 1024 - n),
                           constant_values=1e30)
        return flat.reshape(planes * 8, 128), planes

    mip_planes, n_mp = pad_planes(mip)
    assert n_mp == 1, "mip must fit one (8,128) plane"
    fine_tbl, fine_planes = pad_planes(fine)

    m = origin.shape[0]
    pad = (-m) % BLOCK

    def tile3(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return jnp.moveaxis(x.reshape(-1, 8, 128, 3), 3, 1)

    o_t = tile3(origin)     # (n_blocks, 3, 8, 128)
    d_t = tile3(direction)
    n_blocks = o_t.shape[0]

    kern = _make_kernel(h=h, w=w, focal=cam.focal, cx=cam.cx, cy=cam.cy,
                        n_steps=n_steps, fine_steps=fine_steps,
                        ratio=ratio, bias_frac=bias_frac,
                        interval_frac=interval_frac,
                        fine_planes=fine_planes, shadow_only=shadow_only)
    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
    )
    tile_spec = pl.BlockSpec((None, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    hit, idx, t = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fine_planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=out_shapes,
    )(t_lo.reshape(1, 1), o_t, d_t, mip_planes, fine_tbl)
    hit = hit.reshape(-1)[:m] > 0.5
    idx = idx.reshape(-1)[:m]
    t = t.reshape(-1)[:m]
    return hit, idx, t


# ---------------------------------------------------------------------------
# v3: paired lobe+shadow march — ONE kernel per ray batch for both marches
# of a path-vertex, on (R, 128) = R//8 vreg-row groups per grid step.
#
# v2 losses this recovers (measured r4: lobe 12.7 ns/ray + shadow 8.4 ns/ray
# at 512², ~70% of the whole trace pass):
#   * grid-step overhead: v2 ran one (8, 128) block per grid step (2048
#     steps per 2.1M-ray call); v3 runs R//8 = 8 row groups per step;
#   * lookup dependency chains: v2's per-row composed gather (lane gather
#     feeding a sublane gather) serializes 8 dependent pairs; v3 uses the
#     broadcast-row form — for each of the table's 8·n_planes rows, ONE
#     independent lane-gather on the full (R, 128) block, select-summed.
#     Same exactness (exactly one row matches per element), half the
#     gathers, no chains;
#   * XLA glue between the two calls: the lobe and NEE marches of a bounce
#     share origin/padding/layout work and one kernel launch.
#
# Traversal semantics are bit-identical to v2 / screenspace.march_mip
# (exponential coarse scan, start-cell exclusion, first-two rising edges,
# fine refinement, thickness heuristic) — tests/test_march_kernel.py pins
# both against the XLA reference.
# ---------------------------------------------------------------------------

R_ROWS = 128         # rays per grid step: R_ROWS × 128 lanes
PAIR_BLOCK = R_ROWS * 128


def _lookup_rows(tbl_ref, n_rows: int, flat_idx):
    """(R,128) int32 flat idx → (R,128) f32 from an (n_rows, 128) table.

    Broadcast-row form: for each table row g, one lane-gather of the
    row broadcast over the block, kept where the element's sublane index
    matches g. All n_rows gathers are independent (ILP-friendly)."""
    v = flat_idx // 128
    u = flat_idx - v * 128
    acc = jnp.zeros(flat_idx.shape, jnp.float32)
    for g in range(n_rows):
        row = jnp.broadcast_to(tbl_ref[g:g + 1, :], flat_idx.shape)
        val = jnp.take_along_axis(row, u, axis=1)
        acc = acc + jnp.where(v == g, val, 0.0)
    return acc


def _march_one_v3(o, d, mip_ref, fine_ref, t_lo, *, h, w, focal, cx, cy,
                  n_steps, fine_steps, ratio, bias_frac, interval_frac,
                  fine_planes, shadow_only):
    """One march (coarse + optional fine) on (R, 128) ray blocks.
    Returns (hit f32, idx i32, t f32). Semantics == v2 kernel body."""
    mip_f = _mip_factor(h, w)
    fine_f = _fine_factor(h, w)
    mw = w // mip_f
    mh = h // mip_f
    fw = w // fine_f
    fh = h // fine_f
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def project(qx, qy, qz):
        inv = 1.0 / jnp.maximum(-qz, 1e-6)
        uf = cx + focal * qx * inv - 0.5
        vf = cy - focal * qy * inv - 0.5
        ui = jnp.floor(uf + 0.5).astype(jnp.int32)
        vi = jnp.floor(vf + 0.5).astype(jnp.int32)
        inside = ((ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
                  & (qz < 0.0))
        return ui, vi, inside

    ui0, vi0, _ = project(ox, oy, oz)
    start_cell = jnp.clip(vi0 // mip_f, 0, mh - 1) * mw \
        + jnp.clip(ui0 // mip_f, 0, mw - 1)

    zeros_i = jnp.zeros(shape, jnp.int32)
    t_full = jnp.full(shape, 1.0, jnp.float32) * t_lo

    def coarse_body(i, carry):
        (t, prev_cand, edge_cnt, exited, t_prev,
         tb1, tc1, tb2, tc2) = carry
        qx = ox + t * dx
        qy = oy + t * dy
        qz = oz + t * dz
        ui, vi, inside = project(qx, qy, qz)
        mi = jnp.clip(vi // mip_f, 0, mh - 1) * mw \
            + jnp.clip(ui // mip_f, 0, mw - 1)
        min_d = _lookup_rows(mip_ref, 8, mi)
        ray_d = -qz
        cand = inside & (ray_d > min_d * (1.0 - bias_frac)) \
            & (mi != start_cell) & (exited == 0)
        rising = cand & (prev_cand == 0)
        new1 = rising & (edge_cnt == 0)
        new2 = rising & (edge_cnt == 1)
        tb1 = jnp.where(new1, t_prev, tb1)
        tc1 = jnp.where(new1, t, tc1)
        tb2 = jnp.where(new2, t_prev, tb2)
        tc2 = jnp.where(new2, t, tc2)
        edge_cnt = edge_cnt + rising.astype(jnp.int32)
        exited = exited | ((~inside & (edge_cnt == 0)).astype(jnp.int32))
        return (t * ratio, cand.astype(jnp.int32), edge_cnt, exited,
                t, tb1, tc1, tb2, tc2)

    init = (t_lo, zeros_i, zeros_i, zeros_i, t_lo,
            t_full, t_full, t_full, t_full)
    (_, _, edge_cnt, exited, _, tb1, tc1, tb2, tc2) = \
        jax.lax.fori_loop(0, n_steps, coarse_body, init)

    found = edge_cnt > 0
    if shadow_only:
        return found.astype(jnp.float32), zeros_i, tc1

    def fine_body(k, carry):
        hit, t_hit, idx_hit, excess_hit, local_hit = carry
        second = k >= fine_steps
        lo_t = jnp.where(second, tb2, tb1)
        hi_t = jnp.where(second, tc2, tc1) * ratio
        gate = edge_cnt > jnp.where(second, 1, 0)
        kk = jnp.where(second, k - fine_steps, k).astype(jnp.float32)
        frac = (kk + 1.0) / fine_steps
        t = lo_t + (hi_t - lo_t) * frac
        qx = ox + t * dx
        qy = oy + t * dy
        qz = oz + t * dz
        ui, vi, inside = project(qx, qy, qz)
        fidx = jnp.clip(vi // fine_f, 0, fh - 1) * fw \
            + jnp.clip(ui // fine_f, 0, fw - 1)
        surf = _lookup_rows(fine_ref, fine_planes * 8, fidx)
        ray_d = -qz
        ok = inside & (surf < 1.0e29)
        crossing = ok & (ray_d > surf * (1.0 + bias_frac)) \
            & gate & (hit == 0)
        full_idx = jnp.clip(vi, 0, h - 1) * w + jnp.clip(ui, 0, w - 1)
        t_hit = jnp.where(crossing, t, t_hit)
        idx_hit = jnp.where(crossing, full_idx, idx_hit)
        excess_hit = jnp.where(
            crossing, ray_d - surf * (1.0 + bias_frac), excess_hit)
        local_hit = jnp.where(crossing, ray_d, local_hit)
        return (hit | crossing.astype(jnp.int32), t_hit, idx_hit,
                excess_hit, local_hit)

    ones_f = jnp.ones(shape, jnp.float32)
    hit_i, t_hit, idx_hit, excess_hit, local_hit = jax.lax.fori_loop(
        0, 2 * fine_steps, fine_body,
        (zeros_i, tc1, zeros_i, 0.0 * ones_f, ones_f))
    hit = hit_i > 0
    thin = excess_hit < interval_frac * jnp.maximum(local_hit, 1e-6)
    hit = hit & thin
    return hit.astype(jnp.float32), idx_hit, t_hit


def _make_pair_kernel(*, h, w, focal, cx, cy, n_steps, fine_steps,
                      ratio, s_steps, s_fine_steps, s_ratio, s_shadow_only,
                      bias_frac, interval_frac, fine_planes):
    geom = dict(h=h, w=w, focal=focal, cx=cx, cy=cy, bias_frac=bias_frac,
                interval_frac=interval_frac, fine_planes=fine_planes)

    def kernel(tlo_ref, o_ref, dl_ref, dn_ref, mip_ref, fine_ref,
               hit_ref, idx_ref, t_ref, shad_ref):
        t_lo = tlo_ref[0, 0]
        o = (o_ref[0], o_ref[1], o_ref[2])              # (R, 128) each
        dl = (dl_ref[0], dl_ref[1], dl_ref[2])
        hit, idx, t = _march_one_v3(
            o, dl, mip_ref, fine_ref, t_lo, n_steps=n_steps,
            fine_steps=fine_steps, ratio=ratio, shadow_only=False, **geom)
        hit_ref[:, :] = hit
        idx_ref[:, :] = idx
        t_ref[:, :] = t
        dn = (dn_ref[0], dn_ref[1], dn_ref[2])
        shad, _, _ = _march_one_v3(
            o, dn, mip_ref, fine_ref, t_lo, n_steps=s_steps,
            fine_steps=s_fine_steps, ratio=s_ratio,
            shadow_only=s_shadow_only, **geom)
        shad_ref[:, :] = shad

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_steps", "fine_steps", "s_steps",
                     "s_fine_steps", "s_shadow_only", "t_min_frac",
                     "t_max_frac", "bias_frac", "interval_frac"))
def _march_pair_tpu(cam: Camera, mip, fine, t_lo, origin, d_lobe, d_nee,
                    n_steps: int, fine_steps: int, s_steps: int,
                    s_fine_steps: int, s_shadow_only: bool,
                    t_min_frac: float, t_max_frac: float,
                    bias_frac: float, interval_frac: float):
    h, w = cam.height, cam.width
    ratio = (t_max_frac / t_min_frac) ** (1.0 / max(n_steps - 1, 1))
    s_ratio = (t_max_frac / t_min_frac) ** (1.0 / max(s_steps - 1, 1))

    def pad_planes(tbl):
        n = tbl.shape[0] * tbl.shape[1]
        planes = -(-n // 1024)
        flat = tbl.reshape(-1)
        if planes * 1024 - n:
            flat = jnp.pad(flat, (0, planes * 1024 - n),
                           constant_values=1e30)
        return flat.reshape(planes * 8, 128), planes

    mip_planes, n_mp = pad_planes(mip)
    assert n_mp == 1, "mip must fit one (8,128) plane"
    fine_tbl, fine_planes = pad_planes(fine)

    m = origin.shape[0]
    pad = (-m) % PAIR_BLOCK

    def tile3(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return jnp.moveaxis(x.reshape(-1, R_ROWS, 128, 3), 3, 1)

    o_t = tile3(origin)     # (n_blocks, 3, R, 128)
    dl_t = tile3(d_lobe)
    dn_t = tile3(d_nee)
    n_blocks = o_t.shape[0]

    kern = _make_pair_kernel(
        h=h, w=w, focal=cam.focal, cx=cam.cx, cy=cam.cy,
        n_steps=n_steps, fine_steps=fine_steps, ratio=ratio,
        s_steps=s_steps, s_fine_steps=max(s_fine_steps, 1),
        s_ratio=s_ratio, s_shadow_only=s_shadow_only,
        bias_frac=bias_frac, interval_frac=interval_frac,
        fine_planes=fine_planes)
    fspec = pl.BlockSpec((None, R_ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n_blocks, R_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, R_ROWS, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_blocks, R_ROWS, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_blocks, R_ROWS, 128), jnp.float32),
    )
    vec3 = pl.BlockSpec((None, 3, R_ROWS, 128), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    hit, idx, t, shad = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            vec3, vec3, vec3,
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fine_planes * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(fspec, fspec, fspec, fspec),
        out_shape=out_shapes,
    )(t_lo.reshape(1, 1), o_t, dl_t, dn_t, mip_planes, fine_tbl)

    def unt(x):
        return x.reshape(-1)[:m]

    return (unt(hit) > 0.5, unt(idx), unt(t), unt(shad) > 0.5)


def march_pair(cam: Camera, dist_map, valid_map, origin, d_lobe, d_nee,
               n_steps: int = 24, fine_steps: int = 6,
               shadow_steps: int = 16, shadow_fine_steps: int = 2,
               t_min_frac: float = 2e-3, t_max_frac: float = 3.0,
               bias_frac: float = 4e-3, interval_frac: float = 2.0):
    """Both marches of a path-vertex in one fused kernel: the lobe march
    (full hit resolution) and the NEE shadow march from the same origins.
    Returns (Hit, shadowed). Off-TPU: two march_mip calls (bit-identical
    semantics)."""
    if jax.default_backend() != "tpu":
        hit = march_fused(cam, dist_map, valid_map, origin, d_lobe,
                          n_steps=n_steps, fine_steps=fine_steps,
                          t_min_frac=t_min_frac, t_max_frac=t_max_frac,
                          bias_frac=bias_frac, interval_frac=interval_frac)
        shad = march_fused(cam, dist_map, valid_map, origin, d_nee,
                           n_steps=shadow_steps,
                           fine_steps=max(shadow_fine_steps, 1),
                           t_min_frac=t_min_frac, t_max_frac=t_max_frac,
                           bias_frac=bias_frac,
                           interval_frac=interval_frac,
                           shadow_only=shadow_fine_steps == 0).hit
        return hit, shad

    from materialist_tpu.render import screenspace as ss

    h, w = dist_map.shape
    mip_f = _mip_factor(h, w)
    fine_f = _fine_factor(h, w)
    mip = ss.build_min_mip(dist_map, valid_map, mip_f)
    fine = ss.build_fine_table(dist_map, valid_map, fine_f)
    scene_scale = jnp.maximum(
        jnp.max(jnp.where(valid_map, dist_map, 0.0)), 1e-6)
    t_lo = (t_min_frac * scene_scale).astype(jnp.float32)

    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3)
    dl = d_lobe.reshape(-1, 3)
    dn = d_nee.reshape(-1, 3)
    hit, idx, t, shad = _march_pair_tpu(
        cam, mip, fine, t_lo, o, dl, dn, n_steps, fine_steps,
        shadow_steps, shadow_fine_steps, shadow_fine_steps == 0,
        t_min_frac, t_max_frac, bias_frac, interval_frac)
    return (Hit(hit=hit.reshape(shape), idx=idx.reshape(shape),
                t=t.reshape(shape), exited=~hit.reshape(shape)),
            shad.reshape(shape))


def march_fused(cam: Camera, dist_map, valid_map, origin, direction,
                n_steps: int = 16, fine_steps: int = 6,
                t_min_frac: float = 2e-3, t_max_frac: float = 3.0,
                bias_frac: float = 4e-3, interval_frac: float = 2.0,
                rows: int = 32, shadow_only: bool = False) -> Hit:
    """Drop-in fused replacement for screenspace.march_mip (TPU only;
    falls back to march_mip off-TPU). Run under stop_gradient.

    ``rows`` is accepted for backward compatibility and ignored (v2
    processes fixed (8,128) blocks).
    """
    from materialist_tpu.render import screenspace as ss

    h, w = dist_map.shape
    mip_f = _mip_factor(h, w)
    fine_f = _fine_factor(h, w)
    if jax.default_backend() != "tpu":
        mip = ss.build_min_mip(dist_map, valid_map, mip_f)
        fine = ss.build_fine_table(dist_map, valid_map, fine_f)
        return ss.march_mip(cam, dist_map, valid_map, mip, origin,
                            direction, n_steps=n_steps,
                            fine_steps=fine_steps, t_min_frac=t_min_frac,
                            t_max_frac=t_max_frac, bias_frac=bias_frac,
                            interval_frac=interval_frac,
                            mip_factor=mip_f, shadow_only=shadow_only,
                            fine_table=fine, fine_factor=fine_f)

    mip = ss.build_min_mip(dist_map, valid_map, mip_f)
    fine = ss.build_fine_table(dist_map, valid_map, fine_f)
    scene_scale = jnp.maximum(
        jnp.max(jnp.where(valid_map, dist_map, 0.0)), 1e-6)
    t_lo = (t_min_frac * scene_scale).astype(jnp.float32)

    shape = origin.shape[:-1]
    o = origin.reshape(-1, 3)
    d = direction.reshape(-1, 3)
    hit, idx, t = _march_fused_tpu(cam, mip, fine, t_lo, o, d,
                                   n_steps, fine_steps, shadow_only,
                                   t_min_frac, t_max_frac, bias_frac,
                                   interval_frac)
    return Hit(hit=hit.reshape(shape), idx=idx.reshape(shape),
               t=t.reshape(shape), exited=~hit.reshape(shape))
