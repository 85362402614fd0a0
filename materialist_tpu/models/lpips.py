"""LPIPS perceptual distance (AlexNet backbone) in Flax.

The reference's MaterialNet training uses ``lpips.LPIPS(net='alex')`` for
the albedo loss (Material_net/train_matnet.py:107-109). This module
reproduces that network exactly so only the *weights* are an input:

* AlexNet feature trunk (torchvision layout): 5 conv stages, LPIPS taps
  the five ReLU outputs (lpips/pretrained_networks.py ``alexnet``);
* per-layer unit-normalization over channels, squared difference,
  learned non-negative 1×1 "lin" projections, spatial mean, sum over
  layers (lpips/lpips.py ``forward``);
* input scaling layer: (x − shift) / scale with the published constants
  (lpips/lpips.py ``ScalingLayer``). Inputs are RGB in [-1, 1] like the
  torch package (pass ``normalize=True`` for [0, 1] images, mirroring
  the torch flag).

``convert_lpips_state_dict`` maps the torch ``lpips`` package's
state_dict (net.slice*.weight/bias + lin*.model.1.weight) into this
module's params; ``load_lpips`` wires it to models/train.py's
``perceptual_fn`` hook. Zero-egress note: the weights file itself must
be provided (scripts/fetch_matnet.py documents the recipe) — everything
else is in-repo, so the exact reference training recipe runs the moment
the file exists.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# lpips/lpips.py ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet features: (out_ch, kernel, stride, pad)
_ALEX_CFG = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_CHANNELS = [64, 192, 384, 256, 256]


class AlexFeatures(nn.Module):
    """AlexNet trunk (NHWC); returns the five ReLU tap activations."""

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CFG):
            if i in (1, 2):          # maxpool before conv2 and conv3
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=[(p, p), (p, p)], name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net='alex', spatial=False) forward."""

    @nn.compact
    def __call__(self, x, y, normalize: bool = False):
        if normalize:                       # [0,1] → [-1,1] (torch flag)
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexFeatures(name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (_CHANNELS[i],))
            # lpips NetLinLayer: 1x1 conv with non-negative weights
            val = jnp.sum(d * jnp.maximum(w, 0.0)[None, None, None, :],
                          axis=-1, keepdims=True)
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total                        # (batch,)


def convert_lpips_state_dict(sd) -> dict:
    """torch ``lpips`` package state_dict → Flax params for LPIPS.

    Expected torch keys: ``net.slice{1..5}.<idx>.weight/bias`` (AlexNet
    convs at torchvision indices 0,3,6,8,10) and
    ``lin{0..4}.model.1.weight`` (1×1 lin convs, shape (1, C, 1, 1)).
    Tensors may be torch tensors or numpy arrays.
    """
    def npy(t):
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, "detach") else t)

    def conv(prefix):
        w = npy(sd[prefix + ".weight"])      # (O, I, KH, KW)
        b = npy(sd[prefix + ".bias"])
        return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.asarray(b)}

    # the lpips package wraps torchvision indices into per-slice modules:
    # slice1: 0..1, slice2: 3..4 (after pool 2), slice3: 6..7, slice4: 8..9,
    # slice5: 10..11 — the conv inside slice k keeps its torchvision index
    conv_keys = ["net.slice1.0", "net.slice2.3", "net.slice3.6",
                 "net.slice4.8", "net.slice5.10"]
    params = {"net": {}}
    for i, ck in enumerate(conv_keys):
        params["net"][f"conv{i}"] = conv(ck)
    for i in range(5):
        w = npy(sd[f"lin{i}.model.1.weight"])    # (1, C, 1, 1)
        params[f"lin{i}"] = jnp.asarray(w.reshape(-1))
    return params


def load_lpips(weights_path: str):
    """Build perceptual_fn(pred, target) for models/train.py from a torch
    lpips-alex checkpoint (full state_dict incl. the AlexNet trunk)."""
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    params = convert_lpips_state_dict(sd)
    model = LPIPS()

    def perceptual_fn(pred, target):
        # NHWC [0,1] maps (the trainer's albedo tensors)
        if pred.ndim == 3:
            pred = pred[None]
            target = target[None]
        return jnp.mean(model.apply({"params": params}, pred, target,
                                    normalize=True))

    return perceptual_fn
