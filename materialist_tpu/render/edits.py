"""Masked material edits (render_final.py:143-146,165-180).

``albedo`` edits shift HSV inside the mask; roughness/metallic edits set a
scalar value inside the mask. Runs on device (ops/color.py HSV) instead of
the reference's host skimage round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from materialist_tpu.ops.color import hsv_to_rgb, rgb_to_hsv


def adj_albedo(albedo, hue_shift):
    """HSV-shift (render_final.py:143-146): hsv = clip(hsv + shift)."""
    hsv = rgb_to_hsv(jnp.clip(albedo, 0.0, 1.0))
    hsv = jnp.clip(hsv + jnp.asarray(hue_shift).reshape(1, 1, 3), 0.0, 1.0)
    return hsv_to_rgb(hsv)


def apply_edits(mat: dict, edit: dict):
    """Apply the CLI edit dict to a loaded material dict. Returns the
    edit_flag filename suffix (render_final.py:165-178)."""
    edit_flag = ""
    for key, val in edit.items():
        if val is None:
            continue
        if "mask" not in mat:
            raise FileNotFoundError("Unable to edit img, no mask found")
        mask = np.asarray(mat["mask"])
        if key == "albedo":
            shifted = np.asarray(adj_albedo(jnp.asarray(mat[key]),
                                            np.asarray(val)))
            mat[key] = np.where(mask[..., None], shifted, mat[key])
            edit_flag += f"_{key[:1]}_{np.asarray(val).reshape(-1)[0]}"
        else:
            mat[key] = np.where(mask[..., None], float(val), mat[key])
            edit_flag += f"_{key[:1]}_{val}"
    return edit_flag
