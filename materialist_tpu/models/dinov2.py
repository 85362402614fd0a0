"""DINOv2 ViT encoder in Flax (NHWC, MXU-friendly).

Fresh implementation of the architecture MaterialNet uses
(Material_net/dinov2.py: vit_base, embed 768, depth 12, heads 12, patch 14,
img 518, LayerScale init 1.0, MLP FFN, no register tokens, dinov2.py:353-364,
398-415). Attention uses jax.nn.dot_product_attention (XLA fused path),
replacing the xformers fast path (dinov2_layers/attention.py:65-81).

Weight layout matches models/convert.py's torch→flax mapping.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from materialist_tpu.ops.resize import bicubic_scale


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(b, n, c)
        return nn.Dense(self.dim, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class LayerScale(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DINOv2(nn.Module):
    """vit_base defaults; returns selected intermediate layers."""
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    img_size: int = 518
    mlp_ratio: float = 4.0
    interpolate_offset: float = 0.1

    @nn.compact
    def __call__(self, x, out_layers: Sequence[int] = (2, 5, 8, 11)):
        """x: (B, H, W, 3) normalized image. Returns list of
        (patch_tokens (B, N, C), cls_token (B, C)) per requested layer,
        final-LayerNormed (get_intermediate_layers(norm=True),
        dinov2.py:297-321)."""
        b, h, w, _ = x.shape
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        n_ref = (self.img_size // self.patch_size) ** 2
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, n_ref + 1, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)),
                             x], axis=1)
        x = x + self._interp_pos(pos, gh, gw)

        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        outs = []
        want = set(out_layers)
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, self.mlp_ratio,
                      name=f"block{i}")(x)
            if i in want:
                xn = norm(x)
                outs.append((xn[:, 1:], xn[:, 0]))
        return outs

    def _interp_pos(self, pos, gh, gw):
        """Bicubic pos-embed interpolation (dinov2.py:179-210); identity at
        the native 37×37 grid."""
        n = pos.shape[1] - 1
        if gh * gw == n and gh == gw:
            return pos
        side = int(math.sqrt(n))
        cls_pos = pos[:, :1]
        patch = pos[0, 1:].reshape(side, side, -1)
        sy = (gh + self.interpolate_offset) / side
        sx = (gw + self.interpolate_offset) / side
        patch = bicubic_scale(patch, (sy, sx))
        patch = patch.reshape(1, gh * gw, -1)
        return jnp.concatenate([cls_pos, patch], axis=1)
