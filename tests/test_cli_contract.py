"""CLI contract tests: the §2.10 on-disk layout and flag plumbing.

Runs the inverse CLI end-to-end on a fixture scene in `skip` mode (no
network needed — SURVEY.md §5.4 resume path) at tiny epochs, then the
forward renderer, asserting the output file names the downstream tools
depend on."""

import json
import os
import shutil

import numpy as np
import pytest

from materialist_tpu.io import exr as exr_io
from materialist_tpu.io import image as image_io

pytestmark = pytest.mark.slow  # end-to-end CLI runs: ~2 min each on CPU


@pytest.fixture()
def scene_dir(tmp_path, reference_dir):
    """A miniature scene dir seeded from the indoor fixture (64² crops so
    the CPU test stays fast)."""
    src = os.path.join(reference_dir, "output_imgs", "indoor")
    dst = tmp_path / "output_imgs" / "indoor"
    (dst / "best_results").mkdir(parents=True)

    def down(img, res=64):
        f = img.shape[0] // res
        return img[: res * f, : res * f].reshape(
            res, f, res, f, -1).mean(axis=(1, 3))

    for name in ["albedo.exr", "roughness.exr", "metallic.exr",
                 "normal.exr"]:
        img = exr_io.read(os.path.join(src, "best_results", name))
        exr_io.write(str(dst / "best_results" / name), down(img))
    shutil.copy(os.path.join(src, "best_results", "envmap.hdr"),
                dst / "best_results" / "envmap.hdr")
    exr_io.write(str(dst / "depthPred.exr"),
                 down(exr_io.read(os.path.join(src, "depthPred.exr"))))
    gt = down(exr_io.read(os.path.join(src, "gt_image.exr")))
    exr_io.write(str(dst / "gt_image.exr"), gt)
    image_io.write(str(dst / "gt_image.png"), gt)
    return tmp_path


def test_inverse_skip_resume_layout(scene_dir, monkeypatch):
    """opt_src='skip' reloads best_results and re-optimizes the envmap
    only (inverse_img_w_mi.py:737-749,231-312)."""
    monkeypatch.setenv("MATERIALIST_OUT_DIR",
                       str(scene_dir / "output_imgs"))
    import importlib
    from materialist_tpu import config as gconfig
    importlib.reload(gconfig)
    from materialist_tpu.cli import common
    importlib.reload(common)

    from materialist_tpu.camera import Camera
    from materialist_tpu.opt.loop import InverseOptions, optimize
    from materialist_tpu.render.scene import make_gbuffer
    import jax.numpy as jnp

    out_dir = str(scene_dir / "output_imgs" / "indoor")
    br = os.path.join(out_dir, "best_results")
    mat = {
        "albedo": jnp.asarray(exr_io.read(os.path.join(br, "albedo.exr"))),
        "roughness": jnp.asarray(
            exr_io.read(os.path.join(br, "roughness.exr"))[..., :1]),
        "metallic": jnp.asarray(
            exr_io.read(os.path.join(br, "metallic.exr"))[..., :1]),
        "normal": jnp.asarray(exr_io.read(os.path.join(br, "normal.exr"))),
        "gt_image": jnp.asarray(
            exr_io.read(os.path.join(out_dir, "gt_image.exr"))),
    }
    depth = exr_io.read(os.path.join(out_dir, "depthPred.exr"))
    cam = Camera(64, 64)
    gbuf = make_gbuffer(jnp.asarray(depth[..., 0]), cam, flip_depth=True)
    opts = InverseOptions(opt_src="skip", opt_order=("skip",), spp=4,
                          chunk=4, num_epochs=3, frame_every=2,
                          march_steps=6, shadow_steps=4)
    optimize(gbuf, cam, mat, out_dir, opts)

    for f in ["final_envmap.hdr", "env.png", "opt_env_img.png"]:
        assert os.path.exists(os.path.join(out_dir, f)), f
    for f in ["envmap.hdr", "albedo.exr", "roughness.exr", "metallic.exr",
              "normal.exr", "rendered_img.exr"]:
        assert os.path.exists(os.path.join(br, f)), f
    assert os.path.isdir(os.path.join(out_dir, "env_frames"))
    assert len(os.listdir(os.path.join(out_dir, "env_frames"))) > 0


def test_render_final_real_layout(scene_dir, monkeypatch):
    monkeypatch.setenv("MATERIALIST_OUT_DIR",
                       str(scene_dir / "output_imgs"))
    import importlib
    from materialist_tpu import config as gconfig
    importlib.reload(gconfig)
    from materialist_tpu.cli import common, render_final
    importlib.reload(common)
    importlib.reload(render_final)

    render_final.render_real("indoor", n_iter=2, spp=4)
    out_dir = str(scene_dir / "output_imgs" / "indoor")
    files = os.listdir(out_dir)
    assert any(f.startswith("mi_indoor_envmap_") and f.endswith(".exr")
               for f in files), files
    assert any(f.startswith("mi_indoor_envmap_") and f.endswith(".png")
               for f in files), files
