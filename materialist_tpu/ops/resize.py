"""Device-side resize ops with torch-compatible semantics.

The DPT decoder and MaterialNet postprocessing rely on
F.interpolate(mode='bilinear', align_corners=True) (dpt.py:160,236-240,
util/blocks.py:143) whose grid differs from jax.image.resize (half-pixel);
this module implements the align-corners mapping exactly, plus torch-style
bicubic (A=-0.75) for DINOv2 pos-embed interpolation (dinov2.py:199-205).
"""

from __future__ import annotations

import jax.numpy as jnp


def _ac_coords(out_size: int, in_size: int, dtype):
    if out_size == 1:
        return jnp.zeros((1,), dtype)
    return jnp.linspace(0.0, in_size - 1.0, out_size, dtype=dtype)


def bilinear_align_corners(img, size):
    """img (..., H, W, C) → (..., th, tw, C), align_corners=True bilinear."""
    th, tw = size
    h, w = img.shape[-3], img.shape[-2]
    ys = _ac_coords(th, h, img.dtype)
    xs = _ac_coords(tw, w, img.dtype)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0).reshape((-1, 1, 1))
    wx = (xs - x0).reshape((1, -1, 1))
    top = img[..., y0, :, :][..., :, x0, :] * (1 - wx) \
        + img[..., y0, :, :][..., :, x1, :] * wx
    bot = img[..., y1, :, :][..., :, x0, :] * (1 - wx) \
        + img[..., y1, :, :][..., :, x1, :] * wx
    return top * (1 - wy) + bot * wy


def _cubic_kernel(t, a=-0.75):
    at = jnp.abs(t)
    at2, at3 = at * at, at * at * at
    f1 = (a + 2) * at3 - (a + 3) * at2 + 1
    f2 = a * at3 - 5 * a * at2 + 8 * a * at - 4 * a
    return jnp.where(at <= 1, f1, jnp.where(at < 2, f2, 0.0))


def bicubic_scale(img, scale_hw):
    """Torch-style bicubic (align_corners=False, no antialias) by scale
    factor, for pos-embed interpolation. img (H, W, C)."""
    img = jnp.asarray(img)  # numpy-leaf params would reject traced indices
    h, w, _ = img.shape
    sy, sx = scale_hw
    th, tw = int(h * sy), int(w * sx)

    def axis_coords(t_size, in_size, scale):
        out = (jnp.arange(t_size, dtype=img.dtype) + 0.5) / scale - 0.5
        return out

    ys = axis_coords(th, h, sy)
    xs = axis_coords(tw, w, sx)

    def gather_axis(data, coords, axis_size):
        base = jnp.floor(coords).astype(jnp.int32)
        t = coords - base
        acc = None
        wsum = None
        for k in range(-1, 3):
            idx = jnp.clip(base + k, 0, axis_size - 1)
            wk = _cubic_kernel(t - k)
            part = data[idx] * wk[:, None, None]
            acc = part if acc is None else acc + part
            wsum = wk if wsum is None else wsum + wk
        return acc / wsum[:, None, None]

    tmp = gather_axis(img, ys, h)                       # (th, W, C)
    tmp = jnp.swapaxes(tmp, 0, 1)                       # (W, th, C)
    out = gather_axis(tmp, xs, w)                       # (tw, th, C)
    return jnp.swapaxes(out, 0, 1)                      # (th, tw, C)
