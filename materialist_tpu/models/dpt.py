"""MaterialNet: DINOv2 ViT-B encoder + dual DPT heads (depth & material).

Flax/NHWC rebuild of Material_net/dpt.py:38-217: four intermediate ViT
levels are projected to a conv pyramid (×4, ×2, ×1, ÷2), refined through
four FeatureFusionBlocks (util/blocks.py:83-147), and decoded to
1-channel ReLU depth or 8-channel material (ReLU(albedo,rough,metal) ⧺
tanh+L2-normalized normal, dpt.py:161-170).

Config pinned by the shipped checkpoint: encoder=vitb, features=128,
out_channels=[96,192,384,768], use_bn=False, use_clstoken=False
(inverse_img_w_mi.py:653).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from materialist_tpu.models.dinov2 import DINOv2
from materialist_tpu.ops.resize import bilinear_align_corners


class BlockUpsample(nn.Module):
    """ConvTranspose with stride == kernel (dpt.py:63-75) as an einsum:
    out[y·k+dy, x·k+dx] = Σ_ci in[y,x,ci]·K[dy,dx,ci,co] + b — exactly
    torch's ConvTranspose2d for the non-overlapping case, and a pure MXU
    contraction on TPU."""
    features: int
    factor: int

    @nn.compact
    def __call__(self, x):
        k = self.factor
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, h, w, _ = x.shape
        out = jnp.einsum("bhwi,yxio->bhywxo", x, kernel)
        # (b, h, y, w, x, o): h·y and w·x interleave on reshape
        out = out.reshape(b, h * k, w * k, self.features)
        return out + bias


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, res=None, size=None):
        if res is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(res)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = bilinear_align_corners(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTHead(nn.Module):
    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    output_type: str = "depth"   # depth | material

    @nn.compact
    def __call__(self, levels, patch_h: int, patch_w: int):
        """levels: 4 × (B, N, C) patch tokens (cls unused,
        use_clstoken=False). Returns (B, 14·ph, 14·pw, ch)."""
        feats = []
        for i, tokens in enumerate(levels):
            b, n, c = tokens.shape
            x = tokens.reshape(b, patch_h, patch_w, c)
            x = nn.Conv(self.out_channels[i], (1, 1),
                        name=f"project{i}")(x)
            if i == 0:
                x = BlockUpsample(self.out_channels[0], 4,
                                  name="resize0")(x)
            elif i == 1:
                x = BlockUpsample(self.out_channels[1], 2,
                                  name="resize1")(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[3], (3, 3), strides=(2, 2),
                            padding=1, name="resize3")(x)
            feats.append(x)

        rn = [nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name=f"layer{i + 1}_rn")(feats[i]) for i in range(4)]

        path4 = FeatureFusionBlock(self.features, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        path3 = FeatureFusionBlock(self.features, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3])
        path2 = FeatureFusionBlock(self.features, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3])
        path1 = FeatureFusionBlock(self.features, name="refinenet1")(
            path2, rn[0])

        x = nn.Conv(self.features // 2, (3, 3), padding=1,
                    name="output_conv1")(path1)
        x = bilinear_align_corners(x, (patch_h * 14, patch_w * 14))
        x = nn.Conv(32, (3, 3), padding=1, name="output_conv2_0")(x)
        x = nn.relu(x)
        if self.output_type == "depth":
            x = nn.Conv(1, (1, 1), name="output_conv2_2")(x)
            return nn.relu(x)
        x = nn.Conv(8, (1, 1), name="output_conv2_2")(x)
        arm = nn.relu(x[..., :5])
        normal = jnp.tanh(x[..., 5:8])
        normal = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
        return jnp.concatenate([arm, normal], axis=-1)


class MaterialNet(nn.Module):
    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    layer_idx: Sequence[int] = (2, 5, 8, 11)
    # encoder size — defaults are the checkpoint-pinned vit-b
    # (dpt.py:186-194); the reduced self-trained checkpoint
    # (scripts/train_matnet_scratch.py) overrides these to a committable
    # ~11M-param encoder. Stored in the npz so inference rebuilds the
    # right architecture.
    embed_dim: int = 768
    enc_depth: int = 12
    num_heads: int = 12

    def encoder_config(self) -> dict:
        return {"features": self.features,
                "out_channels": tuple(self.out_channels),
                "layer_idx": tuple(self.layer_idx),
                "embed_dim": self.embed_dim,
                "enc_depth": self.enc_depth,
                "num_heads": self.num_heads}

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized (ImageNet mean/std) image.

        Returns dict of NHWC maps at 14·patch resolution (dpt.py:197-217).
        """
        ph, pw = x.shape[1] // 14, x.shape[2] // 14
        levels = DINOv2(embed_dim=self.embed_dim, depth=self.enc_depth,
                        num_heads=self.num_heads,
                        name="pretrained")(x, self.layer_idx)
        patch_tokens = [t for t, _cls in levels]
        depth = DPTHead(self.features, self.out_channels, "depth",
                        name="depth_head")(patch_tokens, ph, pw)
        depth = nn.relu(depth)
        armn = DPTHead(self.features, self.out_channels, "material",
                       name="material_head")(patch_tokens, ph, pw)
        return {
            "depth": depth,
            "albedo": armn[..., 0:3],
            "roughness": armn[..., 3:4],
            "metallic": armn[..., 4:5],
            "normal": armn[..., 5:8],
        }


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def preprocess(image_01, normalize: bool = False):
    """(H, W, 3) float [0,1] → (1, H, W, 3).

    The reference's infer_image applies NO ImageNet normalization — its
    transform is Resize + PrepareForNet only (dpt.py:243-255) — so the
    default here matches; ``normalize=True`` is available for training
    pipelines that do normalize.
    """
    x = jnp.asarray(image_01, jnp.float32)
    if normalize:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None]
