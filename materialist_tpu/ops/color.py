"""Color-space helpers (counterpart of myutils/misc.py:163-169 and the HSV
edit path of render_final.py:143-146)."""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(img):
    """Pure gamma-2.2 transfer, as the reference uses (misc.py:163-165)."""
    return jnp.maximum(img, 0.0) ** 2.2


def linear_to_srgb(img):
    """Pure gamma-1/2.2 transfer (misc.py:167-169).

    Floored at 1e-8: d(x^(1/2.2))/dx → ∞ at x=0, and MC renders contain
    exact zeros (fully shadowed pixels), which otherwise NaNs the whole
    gradient. Value shift at true zeros is 2e-4 — far below MC noise.
    """
    return jnp.maximum(img, 1e-8) ** (1.0 / 2.2)


def luminance(rgb):
    """BT.601 luma used by the envmap CDF builder (envmap_utils.py:39-40)."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def rgb_to_hsv(rgb):
    """Vectorized RGB→HSV on [0,1] (replaces skimage rgb2hsv host call)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """Vectorized HSV→RGB on [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)
