"""Pinhole camera model for the fixed-view G-buffer renderer.

Folds the reference's whole camera chain — Mitsuba perspective sensor with
``to_world = diag(-1,1,-1)`` (myutils/default_cam.json), the GL projection
matrix (myutils/mi_plugin.py:585-595) and ``mi_world_to_screen``
(mi_plugin.py:645-671), plus the mesh-reconstruction unprojection + 180°
x-rotation (myutils/mesh_recon.py:41,666; inverse_img_w_mi.py:720-727) —
into one consistent convention:

    camera at origin, looking along world -z, +y up;
    pixel (row v, col u) at distance t:
        P(v,u;t) = t * ((u + .5 - cx)/f, -(v + .5 - cy)/f, -1)
    projection of world p (p.z < 0):
        u = cx + f * p.x / (-p.z) - .5,   v = cy - f * p.y / (-p.z) - .5

With this convention, projecting a primary hit returns its own pixel
coordinate exactly, which is what makes material gathers at the first bounce
the identity map (the dominant op in the reference's MatDiffBSDF,
mi_plugin.py:1378-1389).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from materialist_tpu import config


@dataclasses.dataclass(frozen=True)
class Camera:
    height: int = config.IMAGE_SIZE
    width: int = config.IMAGE_SIZE
    fov_deg: float = config.FOV_DEG

    @property
    def focal(self) -> float:
        # f = 0.5 * W / tan(fov/2) — matches mesh_recon.py DEFAULT_CAMERA
        # and MatDiffBSDF (mi_plugin.py:1269).
        return 0.5 * self.width / math.tan(0.5 * math.radians(self.fov_deg))

    @property
    def cx(self) -> float:
        return 0.5 * self.width

    @property
    def cy(self) -> float:
        return 0.5 * self.height

    def pixel_dirs(self, dtype=jnp.float32) -> jnp.ndarray:
        """Unnormalized per-pixel view ray directions, shape (H, W, 3).

        dir(v,u) = ((u+.5-cx)/f, -(v+.5-cy)/f, -1); P = t*dir with t = depth.
        """
        v = jnp.arange(self.height, dtype=dtype) + 0.5
        u = jnp.arange(self.width, dtype=dtype) + 0.5
        uu, vv = jnp.meshgrid(u, v)  # (H, W) each; uu varies along axis 1
        x = (uu - self.cx) / self.focal
        y = -(vv - self.cy) / self.focal
        z = -jnp.ones_like(x)
        return jnp.stack([x, y, z], axis=-1)

    def unproject(self, depth: jnp.ndarray) -> jnp.ndarray:
        """Depth map (H, W) or (H, W, 1) → world positions (H, W, 3).

        ``depth`` is the distance along -z (i.e. -p.z), matching the
        reference's flipped depth ``2*max(d)-d`` fed to the mesh builder.
        """
        if depth.ndim == 3:
            depth = depth[..., 0]
        return self.pixel_dirs(depth.dtype) * depth[..., None]

    def project(self, p: jnp.ndarray) -> jnp.ndarray:
        """World points (..., 3) → continuous pixel coords (..., 2) as (u, v).

        Matches mi_world_to_screen (mi_plugin.py:645-671) which returns
        (x_screen, y_screen); the material gather then uses
        flat = floor(u) + floor(v)*W (mi_plugin.py:1378-1381).
        """
        inv_z = 1.0 / jnp.maximum(-p[..., 2], 1e-6)
        u = self.cx + self.focal * p[..., 0] * inv_z - 0.5
        v = self.cy - self.focal * p[..., 1] * inv_z - 0.5
        return jnp.stack([u, v], axis=-1)


def normals_from_depth(positions: jnp.ndarray) -> jnp.ndarray:
    """Geometric normals from the unprojected position map (H, W, 3).

    Central differences + cross product, oriented toward the camera. Plays
    the role of the PLY mesh vertex normals that Mitsuba computes from the
    depth-derived mesh (``use_mesh_normal=True`` path, SURVEY.md §2.2).
    """
    # Forward/backward differences at borders via edge padding.
    ppad = jnp.pad(positions, ((1, 1), (1, 1), (0, 0)), mode="edge")
    dx = ppad[1:-1, 2:] - ppad[1:-1, :-2]   # along +u
    dy = ppad[2:, 1:-1] - ppad[:-2, 1:-1]   # along +v
    n = jnp.cross(dy, dx)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # Orient toward camera (camera at origin: view dir = -normalize(pos)).
    to_cam = -positions
    flip = jnp.sum(n * to_cam, axis=-1, keepdims=True) < 0.0
    return jnp.where(flip, -n, n)
