"""Fused screen-space march — single Pallas kernel per ray batch.

The mip march in render/screenspace.py issues one table-lookup kernel per
step (~6 ms each at 2M rays — per-call overhead dominates). This kernel
fuses the WHOLE traversal: coarse candidate scan on a 32×32 min-mip (one
(8,128) vreg plane), two refined candidate intervals against a 128×128
mean-depth table (16 planes), hit-pixel index from full-res projection —
all state in vregs, tables in VMEM, one kernel launch per 4096-ray tile.

Table lookups use the composed vreg dynamic_gather (see vreg_gather.py):
128 queries per op pair, exact.

Fixed level choices (at 512²: mip cell 16 px, fine cell 4 px — the same
effective resolution the golden tests validate at 128²):
    mip  = H/16 × W/16  (≤ 1024 texels = 1 plane)
    fine = H/4  × W/4   (≤ 16384 texels = 16 planes)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from materialist_tpu.camera import Camera
from materialist_tpu.render.screenspace import Hit

def _mip_factor(h: int, w: int) -> int:
    """Largest power-of-two factor whose mip fits one (8,128) plane."""
    f = 1
    while (h // f) * (w // f) > 1024:
        f *= 2
    return f


def _fine_factor(h: int, w: int) -> int:
    """Factor whose table fits 16 planes (16384 texels)."""
    f = 1
    while (h // f) * (w // f) > 16384:
        f *= 2
    return f


def _lookup(planes_ref, n_planes, flat_idx_1x128):
    """Composite vreg gather: (1,128) int32 flat idx → (1,128) f32."""
    plane_id = flat_idx_1x128 // 1024
    within = flat_idx_1x128 - plane_id * 1024
    v = within // 128
    u = within - v * 128
    u_b = jnp.broadcast_to(u, (8, 128))
    v_b = jnp.broadcast_to(v, (8, 128))
    acc = jnp.zeros((1, 128), jnp.float32)
    for p in range(n_planes):
        plane = planes_ref[8 * p:8 * p + 8, :]
        b = jnp.take_along_axis(plane, u_b, axis=1)
        val = jnp.take_along_axis(b, v_b, axis=0)[0:1, :]
        acc = jnp.where(plane_id == p, val, acc)
    return acc


def _make_kernel(*, h, w, focal, cx, cy, n_steps, fine_steps, ratio,
                 bias_frac, interval_frac, rows, fine_planes, shadow_only):
    mip_f = _mip_factor(h, w)
    fine_f = _fine_factor(h, w)
    mw = w // mip_f
    mh = h // mip_f
    fw = w // fine_f
    fh = h // fine_f

    def kernel(tlo_ref, o_ref, d_ref, mip_ref, fine_ref,
               hit_ref, idx_ref, t_ref):
        t_lo = tlo_ref[0, 0]
        for g in range(rows):
            ox = o_ref[0, g:g + 1, :]
            oy = o_ref[1, g:g + 1, :]
            oz = o_ref[2, g:g + 1, :]
            dx = d_ref[0, g:g + 1, :]
            dy = d_ref[1, g:g + 1, :]
            dz = d_ref[2, g:g + 1, :]

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

            prev_cand = jnp.zeros((1, 128), jnp.bool_)
            edge_cnt = jnp.zeros((1, 128), jnp.int32)
            exited = jnp.zeros((1, 128), jnp.bool_)
            t_prev = jnp.full((1, 128), 1.0, jnp.float32) * t_lo
            tb1 = t_prev
            tc1 = t_prev
            tb2 = t_prev
            tc2 = t_prev
            for i in range(n_steps):
                t = t_lo * (ratio ** i)
                qx = ox + t * dx
                qy = oy + t * dy
                qz = oz + t * dz
                ui, vi, inside = project(qx, qy, qz)
                mi = jnp.clip(vi // mip_f, 0, mh - 1) * mw \
                    + jnp.clip(ui // mip_f, 0, mw - 1)
                min_d = _lookup(mip_ref, 1, mi)
                ray_d = -qz
                cand = inside & (ray_d > min_d * (1.0 - bias_frac)) \
                    & (mi != start_cell) & ~exited
                rising = cand & ~prev_cand
                new1 = rising & (edge_cnt == 0)
                new2 = rising & (edge_cnt == 1)
                tb1 = jnp.where(new1, t_prev, tb1)
                tc1 = jnp.where(new1, t, tc1)
                tb2 = jnp.where(new2, t_prev, tb2)
                tc2 = jnp.where(new2, t, tc2)
                edge_cnt = edge_cnt + rising.astype(jnp.int32)
                prev_cand = cand
                exited = exited | (~inside & (edge_cnt == 0))
                t_prev = t

            found = edge_cnt > 0
            if shadow_only:
                hit_ref[g:g + 1, :] = found.astype(jnp.float32)
                idx_ref[g:g + 1, :] = jnp.zeros((1, 128), jnp.int32)
                t_ref[g:g + 1, :] = tc1
                continue

            hit = jnp.zeros((1, 128), jnp.bool_)
            t_hit = tc1
            idx_hit = jnp.zeros((1, 128), jnp.int32)
            excess_hit = jnp.zeros((1, 128), jnp.float32)
            local_hit = jnp.ones((1, 128), jnp.float32)
            for s in range(2):
                lo_t = tb1 if s == 0 else tb2
                hi_t = (tc1 if s == 0 else tc2) * ratio
                gate = (edge_cnt > s)
                for k in range(fine_steps):
                    frac = (k + 1.0) / fine_steps
                    t = lo_t + (hi_t - lo_t) * frac
                    qx = ox + t * dx
                    qy = oy + t * dy
                    qz = oz + t * dz
                    ui, vi, inside = project(qx, qy, qz)
                    fidx = jnp.clip(vi // fine_f, 0, fh - 1) * fw \
                        + jnp.clip(ui // fine_f, 0, fw - 1)
                    surf = _lookup(fine_ref, fine_planes, fidx)
                    ray_d = -qz
                    ok = inside & (surf < 1.0e29)
                    crossing = ok & (ray_d > surf * (1.0 + bias_frac)) \
                        & gate & ~hit
                    full_idx = jnp.clip(vi, 0, h - 1) * w \
                        + jnp.clip(ui, 0, w - 1)
                    t_hit = jnp.where(crossing, t, t_hit)
                    idx_hit = jnp.where(crossing, full_idx, idx_hit)
                    excess_hit = jnp.where(
                        crossing, ray_d - surf * (1.0 + bias_frac),
                        excess_hit)
                    local_hit = jnp.where(crossing, ray_d, local_hit)
                    hit = hit | crossing

            # thickness heuristic (matches march/march_mip,
            # screenspace.py:359-362): a crossing far behind the local
            # surface is a silhouette pass-through, not a hit
            thin = excess_hit < interval_frac * jnp.maximum(local_hit, 1e-6)
            hit = hit & thin
            hit_ref[g:g + 1, :] = hit.astype(jnp.float32)
            idx_ref[g:g + 1, :] = idx_hit
            t_ref[g:g + 1, :] = t_hit

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("cam", "n_steps", "fine_steps", "rows", "shadow_only",
                     "t_min_frac", "t_max_frac", "bias_frac",
                     "interval_frac"))
def _march_fused_tpu(cam: Camera, mip, fine, t_lo, origin, direction,
                     n_steps: int, fine_steps: int, rows: int,
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
    assert n_mp == 1, "mip must fit one (8,128) plane (H,W ≤ 512 @ /16)"
    fine_tbl, fine_planes = pad_planes(fine)

    m = origin.shape[0]
    per_tile = rows * 128
    pad = (-m) % per_tile

    def tile3(x):
        x = jnp.pad(x, ((0, pad), (0, 0)))
        return jnp.moveaxis(x.reshape(-1, rows, 128, 3), 3, 1)

    o_t = tile3(origin)     # (n_tiles, 3, rows, 128)
    d_t = tile3(direction)
    n_tiles = o_t.shape[0]

    kern = _make_kernel(h=h, w=w, focal=cam.focal, cx=cam.cx, cy=cam.cy,
                        n_steps=n_steps, fine_steps=fine_steps,
                        ratio=ratio, bias_frac=bias_frac,
                        interval_frac=interval_frac, rows=rows,
                        fine_planes=fine_planes, shadow_only=shadow_only)
    out_shapes = (
        jax.ShapeDtypeStruct((n_tiles, rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, rows, 128), jnp.float32),
    )
    tile_spec = pl.BlockSpec((None, rows, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    hit, idx, t = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 3, rows, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 3, rows, 128), lambda i: (i, 0, 0, 0),
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


def march_fused(cam: Camera, dist_map, valid_map, origin, direction,
                n_steps: int = 16, fine_steps: int = 6,
                t_min_frac: float = 2e-3, t_max_frac: float = 3.0,
                bias_frac: float = 4e-3, interval_frac: float = 2.0,
                rows: int = 32, shadow_only: bool = False) -> Hit:
    """Drop-in fused replacement for screenspace.march_mip (TPU only;
    falls back to march_mip off-TPU). Run under stop_gradient."""
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
                                   n_steps, fine_steps, rows, shadow_only,
                                   t_min_frac, t_max_frac, bias_frac,
                                   interval_frac)
    return Hit(hit=hit.reshape(shape), idx=idx.reshape(shape),
               t=t.reshape(shape), exited=~hit.reshape(shape))
