"""Two-interface dielectric shading for inserted glass objects.

The reference inserts ``oi.ply`` as a smooth Mitsuba ``dielectric``
(int_ior 'acrylic glass' = 1.49) and path-traces it at max_depth=16
(render_final.py:123-136). A smooth dielectric is DETERMINISTIC — each
camera ray splits into one Fresnel-weighted reflection and one
refraction chain — so the TPU-native formulation needs no MC at all:

* entry interface: the rasterized FRONT layer of the glass mesh
  (geometry/raster.py, nearest surface + camera-facing normals);
* exit interface: the rasterized BACK layer (farthest surface + outward
  normals) — the refracted ray is intersected with it by a short
  screen-space fixed-point iteration on the back depth layer;
* exact unpolarized Fresnel (the same R_s/R_p math as the reference's
  glass lobes, mi_plugin.py:1009-1048) splits energy between the
  reflected ray (marched against the scene heightfield, envmap on miss)
  and the doubly-refracted ray (same treatment);
* total internal reflection at the exit reflects once off the back
  interface and exits straight — the dominant term of Mitsuba's deeper
  bounces for convex objects.

The remaining approximation vs max_depth=16 is ≥2 internal bounces and
glass-on-glass inter-reflection; both are visually minor for the convex
insert meshes this mode targets, and the structure (real enter/exit
interfaces, exact Fresnel, true background distortion) matches the
reference where the round-2 screen-space single-refraction did not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.ops import envmap as em
from materialist_tpu.render import screenspace as ss


def refract(d, n, eta):
    """Snell refraction of unit direction ``d`` (pointing INTO the
    surface) at unit normal ``n`` (opposing d); eta = ior_in/ior_out.
    Returns (refracted unit dir, tir mask)."""
    cos_i = -jnp.sum(d * n, axis=-1, keepdims=True)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k[..., 0] < 0.0
    t = eta * d + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0))) * n
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    return t, tir


def reflect(d, n):
    """Mirror reflection of direction ``d`` about normal ``n``."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def fresnel_dielectric(cos_i, eta):
    """Exact unpolarized dielectric Fresnel reflectance.

    cos_i: |cos| of the incident angle (≥0); eta = ior_in/ior_out for
    the transmission side. Returns R in [0, 1] (1 under TIR). Matches
    the reference's R_s/R_p average (mi_plugin.py:1009-1020)."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin_t2 = eta * eta * (1.0 - cos_i * cos_i)
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    # eta = n1/n2: R_s = (n1 cos_i − n2 cos_t)/(n1 cos_i + n2 cos_t) etc.
    r_s = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    r_p = (cos_t * eta - cos_i) / jnp.maximum(eta * cos_t + cos_i, 1e-9)
    r = 0.5 * (r_s * r_s + r_p * r_p)
    return jnp.where(sin_t2 > 1.0, 1.0, jnp.clip(r, 0.0, 1.0))


def _project_px(cam: Camera, p):
    """World point → nearest pixel (row, col) int32, clamped."""
    z = jnp.maximum(-p[..., 2], 1e-6)
    u = cam.cx + cam.focal * p[..., 0] / z
    v = cam.cy - cam.focal * p[..., 1] / z
    ui = jnp.clip(u.astype(jnp.int32), 0, cam.width - 1)
    vi = jnp.clip(v.astype(jnp.int32), 0, cam.height - 1)
    return vi, ui


def _march_to_background(cam: Camera, dist_map, valid_map, bg_img, envmap,
                         pos, d, n_steps=48):
    """Radiance along ray (pos, d): march the scene heightfield; fetch
    the object-free background at the hit pixel, envmap on miss."""
    hit = ss.march(cam, dist_map, valid_map, pos[None], d[None],
                   n_steps=n_steps, vectorized=True)
    idx = hit.idx[0]
    hit_ok = hit.hit[0]
    bg_flat = bg_img.reshape(-1, 3)
    sky = em.lookup_bilinear(envmap, d)
    return jnp.where(hit_ok[..., None], bg_flat[idx], sky)


def shade_glass(cam: Camera, scene_dist, scene_valid, bg_img, envmap,
                front_d, front_n, back_d, back_n, glass_mask,
                ior: float = 1.49, exit_iters: int = 3):
    """Deterministic radiance of the glass pixels.

    Args:
        scene_dist/scene_valid: (H,W) heightfield WITHOUT the glass
            object (diffuse inserts already composited).
        bg_img: (H,W,3) linear radiance of the glass-free scene.
        front_d/front_n, back_d/back_n: rasterized entry/exit layers.
        glass_mask: (H,W) bool — pixels covered by the glass mesh.
    Returns (H,W,3) radiance; zeros outside the mask.
    """
    h, w = glass_mask.shape
    n = h * w
    m = glass_mask.reshape(n)
    d1 = jnp.asarray(front_d).reshape(n)
    n1 = jnp.asarray(front_n).reshape(n, 3)
    bd = jnp.where(jnp.isfinite(jnp.asarray(back_d)),
                   jnp.asarray(back_d), 0.0).reshape(n)
    bn = jnp.asarray(back_n).reshape(n, 3)
    d1 = jnp.where(m, d1, 1.0)

    # entry vertex + camera ray
    uu = (jnp.arange(n) % w).astype(jnp.float32) + 0.5
    vv = (jnp.arange(n) // w).astype(jnp.float32) + 0.5
    ray = jnp.stack([(uu - cam.cx) / cam.focal,
                     -(vv - cam.cy) / cam.focal,
                     -jnp.ones((n,))], axis=-1)
    p1 = ray * d1[:, None]
    view = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                             1e-9)

    cos_i = jnp.abs(jnp.sum(view * n1, axis=-1))
    r_fres = fresnel_dielectric(cos_i, 1.0 / ior)[:, None]

    # ---- reflection branch: off the entry interface into the scene
    refl_dir = reflect(view, n1)
    offset = p1 + 1e-3 * refl_dir
    l_refl = _march_to_background(cam, scene_dist, scene_valid, bg_img,
                                  envmap, offset, refl_dir)

    # ---- transmission branch: refract in, cross to the back layer,
    # refract out (air→glass then glass→air)
    t1, tir_in = refract(view, n1, 1.0 / ior)
    # exit search: fixed point on s with depth(p1 + s·t1) = back_d at the
    # projected pixel; depth = −z (the buffers store z-depth)
    tz = jnp.minimum(t1[..., 2], -1e-3)     # rays curving toward the
    #                                         camera use entry thickness
    s = jnp.maximum((bd - d1), 1e-4) / (-tz)
    bd_flat = bd
    bn_flat = bn
    for _ in range(exit_iters):
        p = p1 + s[:, None] * t1
        vi, ui = _project_px(cam, p)
        q = vi * w + ui
        in_mask = m[q]
        d_exit = jnp.where(in_mask, bd_flat[q], bd)
        s = jnp.maximum((d_exit - d1), 1e-4) / (-tz)
    p2 = p1 + s[:, None] * t1
    vi, ui = _project_px(cam, p2)
    q = vi * w + ui
    n2 = jnp.where(m[q][:, None], bn_flat[q], bn)
    # exit normal must oppose the interior ray
    n2 = jnp.where(jnp.sum(t1 * n2, axis=-1, keepdims=True) > 0, -n2, n2)
    t2, tir_out = refract(t1, n2, ior)
    # TIR at the exit: one internal reflection off the back interface,
    # then exit straight (Fresnel ≈ 1 at the reflected grazing exit)
    t_tir = reflect(t1, n2)
    t2 = jnp.where(tir_out[:, None], t_tir, t2)
    offset2 = p2 + 1e-3 * t2
    l_trans = _march_to_background(cam, scene_dist, scene_valid, bg_img,
                                   envmap, offset2, t2)

    out = r_fres * l_refl + (1.0 - r_fres) * l_trans
    out = jnp.where(tir_in[:, None], l_refl, out)
    return jnp.where(m[:, None], out, 0.0).reshape(h, w, 3)
