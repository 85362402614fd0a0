"""LPIPS-alex parity: the Flax module + converter reproduce the torch
``lpips`` package's forward (lpips/lpips.py, lpips/pretrained_networks.py)
given the same weights.

The lpips pip package is not installed (zero egress), so the reference
is implemented inline in torch following its published structure: a
ScalingLayer, the torchvision AlexNet feature trunk sliced at the five
ReLU taps, per-layer channel unit-normalization, squared difference,
non-negative 1x1 "lin" convs, spatial mean, sum over layers. Weights are
random — the test pins the *architecture + converter*, exactly like
tests/test_matnet_reference_parity.py does for MaterialNet
(Material_net/train_matnet.py:107-109 is the reference call site).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from materialist_tpu.models.lpips import (LPIPS,  # noqa: E402
                                          convert_lpips_state_dict)


def _torch_alexnet_features():
    # torchvision.models.alexnet().features layout (indices matter: the
    # lpips package stores convs at 0,3,6,8,10 inside slice modules)
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),            # 0,1
        tnn.MaxPool2d(3, 2),                                 # 2
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(),            # 3,4
        tnn.MaxPool2d(3, 2),                                 # 5
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),           # 6,7
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),           # 8,9
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),           # 10,11
    )


_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
_TAPS = (1, 4, 7, 9, 11)        # ReLU outputs (end index, exclusive+1)
_CHANNELS = (64, 192, 384, 256, 256)


def _torch_lpips_forward(feats, lins, x, y):
    """lpips.LPIPS.forward with normalize=True inputs in [0,1]."""
    def scaled(t):
        t = 2.0 * t - 1.0
        return (t - _SHIFT) / _SCALE

    def taps(t):
        outs = []
        for i, m in enumerate(feats):
            t = m(t)
            if i in _TAPS:
                outs.append(t)
        return outs

    fx, fy = taps(scaled(x)), taps(scaled(y))
    total = 0.0
    for a, b, w in zip(fx, fy, lins):
        a = a / a.norm(dim=1, keepdim=True).clamp_min(1e-10)
        b = b / b.norm(dim=1, keepdim=True).clamp_min(1e-10)
        d = (a - b) ** 2
        val = (d * w.clamp_min(0.0).view(1, -1, 1, 1)).sum(1, keepdim=True)
        total = total + val.mean(dim=(1, 2, 3))
    return total


def test_lpips_matches_torch_reference():
    torch.manual_seed(0)
    feats = _torch_alexnet_features()
    lins = [torch.randn(c).abs() * 0.1 for c in _CHANNELS]

    # assemble the lpips-package state_dict layout the converter expects
    conv_idx = [0, 3, 6, 8, 10]
    sd = {}
    for sl, ci in enumerate(conv_idx):
        conv = feats[ci]
        sd[f"net.slice{sl + 1}.{ci}.weight"] = conv.weight.detach()
        sd[f"net.slice{sl + 1}.{ci}.bias"] = conv.bias.detach()
    for i, w in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = w.view(1, -1, 1, 1)

    params = convert_lpips_state_dict(sd)

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = _torch_lpips_forward(
            feats, lins,
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(y).permute(0, 3, 1, 2)).numpy()

    got = np.asarray(LPIPS().apply({"params": params}, x, y,
                                   normalize=True))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_lpips_zero_for_identical_images():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 32, 32, 3)).astype(np.float32)
    model = LPIPS()
    variables = model.init(jax.random.PRNGKey(0), x, x, normalize=True)
    d = np.asarray(model.apply(variables, x, x, normalize=True))
    assert np.allclose(d, 0.0, atol=1e-6)
