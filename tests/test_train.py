"""MaterialNet training-stage tests: losses, freezing, one jitted step,
and the MGDataset loader over a synthetic EXR scene tree."""

import os
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.io import exr as exr_io
from materialist_tpu.models import train as T
from materialist_tpu.models.dataset import MGDataset
from materialist_tpu.models.dpt import MaterialNet


def test_silog_scale_invariance():
    key = jax.random.PRNGKey(0)
    d = jax.random.uniform(key, (8, 8, 1)) + 0.5
    valid = jnp.ones_like(d)
    # silog(pred, k*pred) depends only on k ⇒ same for any pred
    l1 = T.silog_loss(d, d * 2.0, valid)
    l2 = T.silog_loss(d * 3.0, d * 6.0, valid)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-5)
    assert float(T.silog_loss(d, d, valid)) < 1e-5


def test_freeze_labels():
    net = MaterialNet()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 70, 70, 3)))["params"]
    labels = T.freeze_labels(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(labels)
    as_dict = {jax.tree_util.keystr(k): v for k, v in flat}
    assert all(v == "freeze" for k, v in as_dict.items()
               if k.startswith("['pretrained']"))
    assert as_dict["['material_head']['refinenet1']['out_conv']['bias']"] \
        == "train"
    assert as_dict["['depth_head']['output_conv2_2']['bias']"] == "train"
    assert as_dict["['depth_head']['output_conv1']['bias']"] == "freeze"


@pytest.mark.slow
def test_train_step_updates_only_unfrozen():
    net = MaterialNet()
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 28, 28, 3)))["params"]
    opt = T.make_optimizer(params, lr=1e-3)
    state = opt.init(params)
    step = T.make_train_step(net, opt)
    batch = {
        "im": jnp.ones((1, 28, 28, 3)) * 0.5,
        "albedo": jnp.ones((1, 28, 28, 3)) * 0.4,
        "roughness": jnp.ones((1, 28, 28, 1)) * 0.6,
        "metallic": jnp.zeros((1, 28, 28, 1)),
        "normal": jnp.concatenate([jnp.zeros((1, 28, 28, 2)),
                                   jnp.ones((1, 28, 28, 1))], -1),
        "depth": jnp.ones((1, 28, 28, 1)) * 2.0,
    }
    p2, state, losses = step(params, state, batch)
    assert np.isfinite(float(losses["total"]))
    # frozen: encoder unchanged; trained: material head scratch changed
    same = np.array_equal(
        np.asarray(params["pretrained"]["block0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(p2["pretrained"]["block0"]["mlp"]["fc1"]["kernel"]))
    assert same
    changed = not np.array_equal(
        np.asarray(params["material_head"]["output_conv1"]["kernel"]),
        np.asarray(p2["material_head"]["output_conv1"]["kernel"]))
    assert changed


def test_mgdataset_loader(tmp_path):
    scene = tmp_path / "scene1"
    scene.mkdir()
    rng = np.random.default_rng(0)
    h, w = 24, 32
    for i in range(3):
        exr_io.write(str(scene / f"{i}_im.exr"),
                     rng.random((h, w, 3)).astype(np.float32))
        exr_io.write(str(scene / f"{i}_albedo.exr"),
                     rng.random((h, w, 3)).astype(np.float32))
        exr_io.write(str(scene / f"{i}_material.exr"),
                     rng.random((h, w, 3)).astype(np.float32))
        exr_io.write(str(scene / f"{i}_depth.exr"),
                     (rng.random((h, w, 1)) * 1000).astype(np.float32))
        n = rng.standard_normal((h, w, 3)).astype(np.float32)
        exr_io.write(str(scene / f"{i}_normal.exr"), n)
        exr_io.write(str(scene / f"{i}_mask.exr"),
                     np.ones((h, w, 1), np.float32))
    (tmp_path / "train.txt").write_text("scene1\n")

    ds = MGDataset(str(tmp_path), im_height=h, im_width=w, phase="TRAIN")
    assert len(ds) == 3
    s = ds[0]
    assert s["im"].shape == (h, w, 3)
    assert s["depth"].shape == (h, w, 1)
    assert abs(np.linalg.norm(s["normal"], axis=-1) - 1).max() < 1e-3
    batches = list(ds.batches(2, shuffle=False))
    assert batches[0]["im"].shape == (2, h, w, 3)


@pytest.mark.slow
def test_train_matnet_end_to_end(tmp_path):
    """The full offline stage on data the framework rendered itself:
    generate an MG-layout dataset with render/shader.py (the BlenderProc
    replacement), fine-tune the real MaterialNet on it through train()
    (partial freezing + AdamW, train_matnet.py:163-194), and require the
    training loss to actually decrease."""
    from scripts.make_mg_dataset import generate

    h, w = 70, 98  # multiples of 14 (ViT patch)
    generate(str(tmp_path), scenes=2, per_scene=2, h=h, w=w, spp=8)

    params, hist = T.train(str(tmp_path), epochs=6, batch_size=2,
                           lr=3e-4, im_hw=(h, w), log_every=4,
                           return_history=True)
    assert len(hist) == 12  # 4 samples / batch 2 x 6 epochs
    assert np.isfinite(hist).all()
    # train loss must drop: last-3 mean well below first-step loss
    assert np.mean(hist[-3:]) < hist[0] * 0.9, hist
