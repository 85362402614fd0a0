"""PosMLP — positional-encoded sine-activated residual MLP (Flax).

Behavioral rebuild of mymodels/mlps.py:129-251 (the optimization-time
residual nets): NeRF-style positional embedding of integer pixel coords
(mlps.py:8-54), sine-activation hidden layers (SineLayer with ω=1 and
default-init — the custom SIREN init is commented out in the reference,
mlps.py:86), skip connections re-concatenating the embedded input, a
zero-initialized final layer (mlps.py:174-176), and per-head output
transforms incl. the straight-through [0,1] clamp (mlps.py:230-248).

The 262144-row batch × 256-wide layers map straight onto the MXU as
(N, C)×(C, 256) matmuls; the whole net is a handful of fused GEMMs.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def positional_embed(x, num_freqs: int):
    """[x, sin(2^k x), cos(2^k x)] for k in 0..num_freqs-1 (mlps.py:13-40)."""
    if num_freqs <= 0:
        return x
    feats = [x]
    for k in range(num_freqs):
        feats.append(jnp.sin((2.0 ** k) * x))
        feats.append(jnp.cos((2.0 ** k) * x))
    return jnp.concatenate(feats, axis=-1)


def _torch_linear_init():
    """torch.nn.Linear default init: U(±1/√fan_in) for W and b."""
    def w_init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return w_init


class PosMLP(nn.Module):
    """Args mirror the reference constructor (mlps.py:131-138)."""
    in_dims: int
    out_dims: int
    dims: Sequence[int] = (256, 256, 256, 256)
    skip_connection: Sequence[int] = (1, 3)
    multires_view: int = 2
    output_type: str = "envmap"   # envmap | arm | armn | normal
    color_ch: int = 5

    def grid_coords(self, n_rows: int):
        """Integer (row, col) coords for a flattened image of n_rows pixels.

        Mirrors img2points' shape inference (mlps.py:190-209): square image
        if n > 512 rows else a 2:1 map (the 16×32 envmap).
        """
        if n_rows > 512:
            h = w = int(round(math.sqrt(n_rows)))
        else:
            h = int(round(math.sqrt(n_rows / 2)))
            w = 2 * h
        if h * w != n_rows:
            raise ValueError(f"cannot infer grid for {n_rows} points")
        r = jnp.arange(h, dtype=jnp.float32)
        c = jnp.arange(w, dtype=jnp.float32)
        rr, cc = jnp.meshgrid(r, c, indexing="ij")
        return jnp.stack([rr.reshape(-1), cc.reshape(-1)], axis=-1)

    @nn.compact
    def __call__(self, img):
        """img: (N, color_ch) flattened start maps → (N, out_dims)."""
        coords = self.grid_coords(img.shape[0])
        pts = jnp.concatenate(
            [positional_embed(coords, self.multires_view), img], axis=-1)

        x = pts
        in_width = pts.shape[-1]
        num_hidden = len(self.dims)
        init = _torch_linear_init()
        for layer in range(num_hidden):
            if layer + 1 in self.skip_connection:
                out_dim = self.dims[layer] - in_width
            else:
                out_dim = self.dims[layer]
            if layer in self.skip_connection:
                x = jnp.concatenate([x, pts], axis=-1)
            x = nn.Dense(out_dim, kernel_init=init, bias_init=init,
                         name=f"lin{layer}")(x)
            x = jnp.sin(x)
        if num_hidden in self.skip_connection:
            x = jnp.concatenate([x, pts], axis=-1)
        x = nn.Dense(self.out_dims, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="lin_out")(x)

        if self.output_type == "envmap":
            return jax.nn.softplus(x)
        if self.output_type == "arm":
            y = 1.3 * jnp.tanh(x) + img
            return _straight_through_clamp(y)
        if self.output_type == "armn":
            arm = _straight_through_clamp(
                1.3 * jnp.tanh(x[..., 0:5]) + img[..., 0:5])
            normal = jnp.tanh(x[..., 5:8] + img[..., 5:8])
            return jnp.concatenate([arm, normal], axis=-1)
        if self.output_type == "normal":
            y = jnp.tanh(x + img)
            return y / jnp.maximum(
                jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-9)
        raise ValueError(f"unknown output_type {self.output_type}")


def _straight_through_clamp(x, lo=0.0, hi=1.0):
    """clamp(x).detach() + x - x.detach() (mlps.py:234)."""
    return jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x) + x


def make_envmap_net():
    """The envmap head (inverse_img_w_mi.py:117-123)."""
    return PosMLP(in_dims=5, out_dims=3, multires_view=2,
                  output_type="envmap", color_ch=3)


def make_brdf_net(output_type: str = "arm"):
    """The material head (inverse_img_w_mi.py:159-172)."""
    if output_type == "arm":
        return PosMLP(in_dims=7, out_dims=5, multires_view=2,
                      output_type="arm", color_ch=5)
    if output_type == "armn":
        return PosMLP(in_dims=10, out_dims=8, multires_view=0,
                      output_type="armn", color_ch=8)
    raise ValueError(output_type)
