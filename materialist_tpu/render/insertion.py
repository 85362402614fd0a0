"""Object insertion: composite external meshes into the G-buffer scene.

Counterpart of render_final.py --mode oi (:100-141,207-237): the scene
gains ``oi.ply`` (dielectric 'acrylic glass', ior 1.49) and ``oi2.ply``
(diffuse 0.8 grey). TPU-native formulation: rasterize the meshes into the
depth/normal buffers (geometry/raster.py), composite where they are closer
than the heightfield, and shade in one pass — the glass object uses the
screen-space-refraction BSDF with the object-free rendering as its
background (the same trick the reference's own TransBSDF uses for
transparency, mi_plugin.py:1503-1519).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera, normals_from_depth
from materialist_tpu.geometry.ply import read_ply
from materialist_tpu.geometry.raster import rasterize
from materialist_tpu.render import forward
from materialist_tpu.render.scene import GBuffer, Materials

ACRYLIC_IOR = 1.49


def composite_gbuffer(gbuf: GBuffer, cam: Camera, meshes):
    """Insert rasterized meshes into the G-buffer. Returns
    (new_gbuf, per-mesh masks)."""
    dist = np.asarray(gbuf.dist)
    masks = []
    normals = np.asarray(gbuf.normal_geo).copy()
    for verts, faces in meshes:
        d_m, n_m, cover = rasterize(verts, faces, cam)
        closer = cover & ((d_m < dist) | ~np.asarray(gbuf.valid))
        dist = np.where(closer, d_m, dist)
        normals = np.where(closer[..., None], n_m, normals)
        masks.append(closer)
    dist_j = jnp.asarray(dist)
    pos = cam.unproject(dist_j)
    # recompute heightfield normals only outside inserted masks (meshes
    # keep their exact face normals)
    any_mask = np.zeros_like(dist, bool)
    for m in masks:
        any_mask |= m
    n_geo = jnp.where(jnp.asarray(any_mask)[..., None],
                      jnp.asarray(normals), normals_from_depth(pos))
    wo = -pos / jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True),
                            1e-9)
    valid = gbuf.valid | jnp.asarray(any_mask)
    return GBuffer(pos, n_geo, dist_j, wo, valid), masks


def render_insert(scene_dir: str, mat: dict, gbuf: GBuffer, cam: Camera,
                  envmap, n_iter: int = 10, spp: int = 32,
                  seed: int = 0) -> np.ndarray:
    """Render the scene with oi.ply / oi2.ply inserted
    (render_final.py:207-237; spp 32 ×10 passes averaged).

    The diffuse insert composites into the heightfield and shades with
    the MC estimator. The glass insert is the reference's smooth
    dielectric (ior 1.49, 'acrylic glass'): shaded DETERMINISTICALLY by
    two-interface refraction through its rasterized front/back layers
    with exact Fresnel (render/glass.py) over the glass-free rendering —
    the honest analog of Mitsuba's max_depth=16 dielectric path."""
    from materialist_tpu.geometry.raster import rasterize
    from materialist_tpu.render import glass as glass_mod

    glass_mesh = None
    diffuse_meshes = []
    for name, kind in (("oi.ply", "glass"), ("oi2.ply", "diffuse")):
        p = os.path.join(scene_dir, name)
        if os.path.exists(p):
            v, f = read_ply(p)
            if kind == "glass":
                glass_mesh = (v, f)
            else:
                diffuse_meshes.append((v, f))
    if glass_mesh is None and not diffuse_meshes:
        raise FileNotFoundError(
            f"object insertion requires oi.ply/oi2.ply in {scene_dir}")

    # ---- scene + diffuse insert (glass-free): the MC-estimated base
    base_gbuf, masks = (composite_gbuffer(gbuf, cam, diffuse_meshes)
                        if diffuse_meshes else (gbuf, []))
    albedo = np.asarray(mat["albedo"]).copy()
    rough = np.asarray(mat["roughness"]).copy()
    metal = np.asarray(mat["metallic"]).copy()
    normal = np.asarray(mat["normal"]).copy()
    for m in masks:
        albedo[m] = 0.8         # diffuse 0.8 grey (render_final.py:131)
        rough[m] = 1.0
        metal[m] = 0.0
        normal[m] = np.asarray(base_gbuf.normal_geo)[m]
    mats = Materials(jnp.asarray(albedo), jnp.asarray(rough),
                     jnp.asarray(metal), jnp.asarray(normal))
    base = forward.render_averaged(base_gbuf, cam, mats, envmap,
                                   n_iter=n_iter, spp=spp, denoise=True,
                                   seed=seed)
    if glass_mesh is None:
        return base

    # ---- glass insert: deterministic two-interface dielectric
    v, f = glass_mesh
    front_d, front_n, cover = rasterize(v, f, cam, layer="front")
    back_d, back_n, _ = rasterize(v, f, cam, layer="back")
    scene_dist = np.asarray(base_gbuf.dist)
    glass_mask = cover & ((front_d < scene_dist) |
                          ~np.asarray(base_gbuf.valid))
    if not glass_mask.any():
        return base

    l_glass = glass_mod.shade_glass(
        cam, base_gbuf.dist, base_gbuf.valid, jnp.asarray(base), envmap,
        front_d, front_n, back_d, back_n, jnp.asarray(glass_mask),
        ior=ACRYLIC_IOR)
    out = jnp.where(jnp.asarray(glass_mask)[..., None], l_glass,
                    jnp.asarray(base))
    return np.asarray(out)
