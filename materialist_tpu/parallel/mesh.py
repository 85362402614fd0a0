"""Device-mesh construction for multi-chip scaling.

The reference is strictly single-GPU (SURVEY.md §2.11) — this layer is new
TPU-native design: MC rendering is sharded over the sample (spp) axis
(data-parallel estimates, psum-mean over ICI) and/or the pixel-row axis
(for large films where per-chip HBM matters). Materials/envmap stay
replicated (8 MB at 512²); gradients all-reduce through the psum'd mean.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int = None, axis: str = "spp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(n_px: int, n_spp: int) -> Mesh:
    devices = np.array(jax.devices()[: n_px * n_spp]).reshape(n_px, n_spp)
    return Mesh(devices, ("px", "spp"))
