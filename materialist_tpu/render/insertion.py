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
from materialist_tpu.render import bsdf as bsdf_mod
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
    (render_final.py:207-237; spp 32 ×10 passes averaged)."""
    meshes = []
    kinds = []
    for name, kind in (("oi.ply", "glass"), ("oi2.ply", "diffuse")):
        p = os.path.join(scene_dir, name)
        if os.path.exists(p):
            v, f = read_ply(p)
            meshes.append((v, f))
            kinds.append(kind)
    if not meshes:
        raise FileNotFoundError(
            f"object insertion requires oi.ply/oi2.ply in {scene_dir}")

    new_gbuf, masks = composite_gbuffer(gbuf, cam, meshes)

    # materials: scene maps, overridden inside the inserted masks
    albedo = np.asarray(mat["albedo"]).copy()
    rough = np.asarray(mat["roughness"]).copy()
    metal = np.asarray(mat["metallic"]).copy()
    normal = np.asarray(mat["normal"]).copy()
    glass_mask = np.zeros(albedo.shape[:2], bool)
    for m, kind in zip(masks, kinds):
        if kind == "diffuse":
            albedo[m] = 0.8
            rough[m] = 1.0
            metal[m] = 0.0
        else:
            albedo[m] = 1.0
            rough[m] = 0.05
            metal[m] = 0.0
            glass_mask |= m
        normal[m] = np.asarray(new_gbuf.normal_geo)[m]

    mats = Materials(jnp.asarray(albedo), jnp.asarray(rough),
                     jnp.asarray(metal), jnp.asarray(normal))

    if glass_mask.any():
        # background for the glass = object-free render (one pass)
        bg = forward.render_averaged(gbuf, cam,
                                     Materials(jnp.asarray(mat["albedo"]),
                                               jnp.asarray(mat["roughness"]),
                                               jnp.asarray(mat["metallic"]),
                                               jnp.asarray(mat["normal"])),
                                     envmap, n_iter=1, spp=spp,
                                     denoise=True, seed=seed + 77)
        n = cam.height * cam.width
        bsdf = bsdf_mod.transparent(
            mats, jnp.asarray(bg), jnp.asarray(glass_mask), 0.9,
            ACRYLIC_IOR, cam, new_gbuf.position.reshape(n, 3))
    else:
        bsdf = None

    return forward.render_averaged(new_gbuf, cam, mats, envmap,
                                   n_iter=n_iter, spp=spp, bsdf=bsdf,
                                   denoise=(bsdf is None), seed=seed)
