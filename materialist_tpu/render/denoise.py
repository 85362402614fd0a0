"""Edge-aware à-trous wavelet denoiser.

TPU replacement for the OptiX AI denoiser used by the forward renderers
(render_final.py:163,193-197): each of the n_iter MC renders is denoised
before averaging. An à-trous pass is a stack of small dilated 5×5
convolutions with joint range weights — pure VPU work that XLA fuses, no
NN weights required. Guides (albedo/normal) sharpen edges like the OptiX
aux buffers would.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_KERNEL_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _shift2d(img, dy, dx):
    return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)


@functools.partial(jax.jit, static_argnames=("n_passes",))
def atrous_denoise(color, albedo=None, normal=None, n_passes: int = 3,
                   sigma_color: float = 0.25, sigma_albedo: float = 0.15,
                   sigma_normal: float = 0.3):
    """Denoise (H, W, 3) linear radiance. Guides optional (H, W, 3)."""
    out = color
    for p in range(n_passes):
        step = 1 << p
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros(out.shape[:2] + (1,), out.dtype)
        for i in range(5):
            for j in range(5):
                dy, dx = (i - 2) * step, (j - 2) * step
                kw = float(_KERNEL_1D[i] * _KERNEL_1D[j])
                c = _shift2d(out, dy, dx)
                w = jnp.full(out.shape[:2], kw, out.dtype)
                dc = jnp.sum((c - out) ** 2, axis=-1)
                w = w * jnp.exp(-dc / (2 * sigma_color ** 2))
                if albedo is not None:
                    da = jnp.sum((_shift2d(albedo, dy, dx) - albedo) ** 2,
                                 axis=-1)
                    w = w * jnp.exp(-da / (2 * sigma_albedo ** 2))
                if normal is not None:
                    dn = jnp.sum((_shift2d(normal, dy, dx) - normal) ** 2,
                                 axis=-1)
                    w = w * jnp.exp(-dn / (2 * sigma_normal ** 2))
                acc = acc + c * w[..., None]
                wacc = wacc + w[..., None]
        out = acc / jnp.maximum(wacc, 1e-8)
    return out
