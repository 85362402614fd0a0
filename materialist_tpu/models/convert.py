"""torch→Flax weight conversion for MaterialNet checkpoints.

Maps the reference's state_dict (Material_net/dpt.py MaterialNet over
Material_net/dinov2.py DINOv2) onto materialist_tpu/models/{dinov2,dpt}.py
parameter trees. Layout rules:

    torch Conv2d  (out,in,kh,kw) → flax (kh,kw,in,out)
    torch ConvT2d (in,out,kh,kw) → block-upsample kernel (kh,kw,in,out)
    torch Linear  (out,in)       → flax Dense kernel (in,out)
    LayerNorm weight/bias        → scale/bias

The shipped checkpoint comes from HuggingFace Lez/MatNet
(inverse_img_w_mi.py:648-652); set MATNET_WEIGHTS=/path/to/.pth or let
load_matnet_params try hf_hub_download.
"""

from __future__ import annotations

import os

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w):
    return np.transpose(w, (2, 3, 0, 1))


def _dense(w):
    return np.transpose(w, (1, 0))


def _get(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def convert_dinov2(sd, prefix="pretrained."):
    p = {}
    p["patch_embed"] = {"kernel": _conv(_get(sd, prefix + "patch_embed.proj.weight")),
                        "bias": _get(sd, prefix + "patch_embed.proj.bias")}
    p["cls_token"] = _get(sd, prefix + "cls_token")
    p["pos_embed"] = _get(sd, prefix + "pos_embed")
    p["norm"] = {"scale": _get(sd, prefix + "norm.weight"),
                 "bias": _get(sd, prefix + "norm.bias")}
    i = 0
    while prefix + f"blocks.{i}.norm1.weight" in sd:
        b = f"blocks.{i}."
        p[f"block{i}"] = {
            "norm1": {"scale": _get(sd, prefix + b + "norm1.weight"),
                      "bias": _get(sd, prefix + b + "norm1.bias")},
            "attn": {
                "qkv": {"kernel": _dense(_get(sd, prefix + b + "attn.qkv.weight")),
                        "bias": _get(sd, prefix + b + "attn.qkv.bias")},
                "proj": {"kernel": _dense(_get(sd, prefix + b + "attn.proj.weight")),
                         "bias": _get(sd, prefix + b + "attn.proj.bias")},
            },
            "ls1": {"gamma": _get(sd, prefix + b + "ls1.gamma")},
            "norm2": {"scale": _get(sd, prefix + b + "norm2.weight"),
                      "bias": _get(sd, prefix + b + "norm2.bias")},
            "mlp": {
                "fc1": {"kernel": _dense(_get(sd, prefix + b + "mlp.fc1.weight")),
                        "bias": _get(sd, prefix + b + "mlp.fc1.bias")},
                "fc2": {"kernel": _dense(_get(sd, prefix + b + "mlp.fc2.weight")),
                        "bias": _get(sd, prefix + b + "mlp.fc2.bias")},
            },
            "ls2": {"gamma": _get(sd, prefix + b + "ls2.gamma")},
        }
        i += 1
    return p


def convert_dpt_head(sd, prefix):
    p = {}
    for i in range(4):
        p[f"project{i}"] = {
            "kernel": _conv(_get(sd, f"{prefix}projects.{i}.weight")),
            "bias": _get(sd, f"{prefix}projects.{i}.bias")}
    p["resize0"] = {"kernel": _convT(_get(sd, f"{prefix}resize_layers.0.weight")),
                    "bias": _get(sd, f"{prefix}resize_layers.0.bias")}
    p["resize1"] = {"kernel": _convT(_get(sd, f"{prefix}resize_layers.1.weight")),
                    "bias": _get(sd, f"{prefix}resize_layers.1.bias")}
    p["resize3"] = {"kernel": _conv(_get(sd, f"{prefix}resize_layers.3.weight")),
                    "bias": _get(sd, f"{prefix}resize_layers.3.bias")}
    for i in range(4):
        p[f"layer{i + 1}_rn"] = {
            "kernel": _conv(_get(sd, f"{prefix}scratch.layer{i + 1}_rn.weight"))}
    for i in range(1, 5):
        rp = f"{prefix}scratch.refinenet{i}."
        # refinenet4 receives a single input (dpt.py:154), so its
        # resConfUnit1 is dead weight in the checkpoint — skip it to match
        # the flax module tree exactly.
        block = {
            "rcu2": {
                "conv1": {"kernel": _conv(_get(sd, rp + "resConfUnit2.conv1.weight")),
                          "bias": _get(sd, rp + "resConfUnit2.conv1.bias")},
                "conv2": {"kernel": _conv(_get(sd, rp + "resConfUnit2.conv2.weight")),
                          "bias": _get(sd, rp + "resConfUnit2.conv2.bias")},
            },
            "out_conv": {"kernel": _conv(_get(sd, rp + "out_conv.weight")),
                         "bias": _get(sd, rp + "out_conv.bias")},
        }
        if i != 4:
            block["rcu1"] = {
                "conv1": {"kernel": _conv(_get(sd, rp + "resConfUnit1.conv1.weight")),
                          "bias": _get(sd, rp + "resConfUnit1.conv1.bias")},
                "conv2": {"kernel": _conv(_get(sd, rp + "resConfUnit1.conv2.weight")),
                          "bias": _get(sd, rp + "resConfUnit1.conv2.bias")},
            }
        p[f"refinenet{i}"] = block
    p["output_conv1"] = {
        "kernel": _conv(_get(sd, f"{prefix}scratch.output_conv1.weight")),
        "bias": _get(sd, f"{prefix}scratch.output_conv1.bias")}
    p["output_conv2_0"] = {
        "kernel": _conv(_get(sd, f"{prefix}scratch.output_conv2.0.weight")),
        "bias": _get(sd, f"{prefix}scratch.output_conv2.0.bias")}
    p["output_conv2_2"] = {
        "kernel": _conv(_get(sd, f"{prefix}scratch.output_conv2.2.weight")),
        "bias": _get(sd, f"{prefix}scratch.output_conv2.2.bias")}
    return p


def convert_matnet(sd) -> dict:
    """Full MaterialNet state_dict → flax params tree."""
    return {
        "pretrained": convert_dinov2(sd, "pretrained."),
        "depth_head": convert_dpt_head(sd, "depth_head."),
        "material_head": convert_dpt_head(sd, "material_head."),
    }


def load_matnet_params(weights_path: str = None) -> dict:
    """Load + convert the MatNet checkpoint.

    Resolution order: explicit arg → $MATNET_WEIGHTS → hf_hub_download
    ('Lez/MatNet', matching the reference's inverse_img_w_mi.py:648-652).
    """
    path = weights_path or os.environ.get("MATNET_WEIGHTS")
    if path is None:
        try:
            from huggingface_hub import hf_hub_download
            path = hf_hub_download(repo_id="Lez/MatNet",
                                   filename="matnet_weights.pth",
                                   repo_type="model")
        except Exception as e:
            raise FileNotFoundError(
                "MaterialNet weights unavailable: set MATNET_WEIGHTS to a "
                f"local matnet_weights.pth (HF download failed: {e})")
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_matnet(sd)
