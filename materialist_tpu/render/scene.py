"""Scene containers: G-buffer + material maps.

Replaces the reference's Mitsuba scene dict (PLY mesh + MatDiffBSDF +
perspective sensor + envmap emitter, inverse_img_w_mi.py:30-56). In the
TPU design the depth map *is* the geometry: the scene is the unprojected
pixel grid plus HBM-resident material maps, all plain jnp arrays inside a
NamedTuple pytree, so the whole scene flows through jit/grad/shard_map.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera, normals_from_depth
from materialist_tpu.io import image as image_io


class GBuffer(NamedTuple):
    """Per-pixel geometry derived from the depth map. All (H, W, ...)"""
    position: jnp.ndarray    # (H, W, 3) world position
    normal_geo: jnp.ndarray  # (H, W, 3) depth-gradient normal ("mesh normal")
    dist: jnp.ndarray        # (H, W)   -z distance used by the ray marcher
    wo: jnp.ndarray          # (H, W, 3) unit direction surface → camera
    valid: jnp.ndarray       # (H, W)   bool, False for sky/masked pixels


class Materials(NamedTuple):
    """Differentiable material maps (the reference's shape.bsdf.{a,r,m,n})."""
    albedo: jnp.ndarray     # (H, W, 3)
    roughness: jnp.ndarray  # (H, W, 1)
    metallic: jnp.ndarray   # (H, W, 1)
    normal: jnp.ndarray     # (H, W, 3) shading normal (used when
    #                         use_mesh_normal=False, mi_plugin.py:1386-1389)


def make_gbuffer(depth, camera: Optional[Camera] = None,
                 flip_depth: bool = True, mask=None) -> GBuffer:
    """Build the G-buffer from a predicted depth map.

    ``flip_depth`` applies the reference's ``2*max(d) - d`` mirror
    (inverse_img_w_mi.py:721) that turns the network's inverse-style depth
    into a distance-along-view: raw 0 (farthest) ⇒ distance 2·max. ``mask``
    is the optional mesh_mask (inverse_img_w_mi.py:722-724): masked pixels
    carry no geometry, so the camera sees the envmap there.
    """
    depth = jnp.asarray(depth, jnp.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    if camera is None:
        camera = Camera(height=depth.shape[0], width=depth.shape[1])
    if flip_depth:
        dist = 2.0 * depth.max() - depth
    else:
        dist = depth
    if mask is not None:
        mask = jnp.asarray(mask)
        if mask.ndim == 3:
            mask = mask[..., 0]
        valid = ~(mask > 0)
    else:
        valid = jnp.ones_like(dist, bool)
    valid = valid & (dist > 1e-6)
    dist = jnp.where(valid, dist, 0.0)
    pos = camera.unproject(dist)
    n_geo = normals_from_depth(pos)
    wo = -pos / jnp.maximum(
        jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-9)
    return GBuffer(pos, n_geo, dist, wo, valid)


def load_best_results(root_dir: str, roughness_remap: bool = True) -> dict:
    """Load an optimized material dir (mi_plugin.py:701-739 contract).

    Reads albedo/roughness/metallic/normal.exr (+ optional bg.png, mask.png,
    envmap.hdr). ``roughness_remap`` applies the reference's r*0.95+0.05.
    Returns numpy arrays keyed like the reference's ``mat`` dict.
    """
    def rd(name):
        return image_io.read(os.path.join(root_dir, name))

    mat = {
        "albedo": rd("albedo.exr")[..., :3],
        "roughness": rd("roughness.exr")[..., :1],
        "metallic": rd("metallic.exr")[..., :1],
        "normal": rd("normal.exr")[..., :3],
    }
    if roughness_remap:
        mat["roughness"] = mat["roughness"] * 0.95 + 0.05
    bg_path = os.path.join(root_dir, "bg.png")
    if os.path.exists(bg_path):
        bg = image_io.read(bg_path)[..., :3]
        if bg.shape[:2] != mat["albedo"].shape[:2]:
            bg = image_io.resize_bilinear_align_corners(
                bg, mat["albedo"].shape[:2])
        mat["bg"] = bg
    mask_path = os.path.join(root_dir, "mask.png")
    if os.path.exists(mask_path):
        mask = image_io.read(mask_path)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mat["mask"] = mask > 0.5
    env_path = os.path.join(root_dir, "envmap.hdr")
    if os.path.exists(env_path):
        mat["envmap"] = image_io.read(env_path)
    return mat


def materials_from_dict(mat: dict) -> Materials:
    z = np.zeros_like(mat["albedo"])
    return Materials(
        albedo=jnp.asarray(mat["albedo"], jnp.float32),
        roughness=jnp.asarray(mat["roughness"], jnp.float32),
        metallic=jnp.asarray(mat["metallic"], jnp.float32),
        normal=jnp.asarray(mat.get("normal", z), jnp.float32),
    )
