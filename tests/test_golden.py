"""Golden-image regression tests against the reference's shipped outputs.

Strategy (SURVEY.md §4): render from output_imgs/{scene}/best_results/*
material maps + envmap + depthPred geometry, and require PSNR against
rendered_img.exr. CI runs on CPU, so fixtures are box-downsampled to 128²
and spp is reduced; thresholds are set ~2 dB below measured values
(full-res 512²: indoor 18.6 dB linear / jinjya 20.2 dB sRGB on TPU).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr, image
from materialist_tpu.render.scene import (GBuffer, Materials, make_gbuffer,
                                          load_best_results)
from materialist_tpu.render.shader import RenderConfig, render

pytestmark = pytest.mark.slow  # golden/convergence runs: minutes on CPU

RES = 128


def _down(img, res=RES):
    """Box-downsample (H, W, C) by integer factor."""
    f = img.shape[0] // res
    h, w = res * f, res * f
    return img[:h, :w].reshape(res, f, res, f, -1).mean(axis=(1, 3))


def psnr(a, b):
    return -10 * np.log10(np.mean((a - b) ** 2))


@pytest.fixture(scope="module")
def indoor(reference_dir):
    base = os.path.join(reference_dir, "output_imgs", "indoor")
    mat = load_best_results(os.path.join(base, "best_results"),
                            roughness_remap=False)
    return {
        "mat": mat,
        "depth": exr.read(os.path.join(base, "depthPred.exr")),
        "ref": exr.read(os.path.join(base, "best_results",
                                     "rendered_img.exr")),
        "gt": exr.read(os.path.join(base, "gt_image.exr")),
    }


def _render_scene(mat, depth, mask=None, spp=16, res=RES):
    cam = Camera(res, res)
    gbuf = make_gbuffer(jnp.asarray(_down(depth)[..., 0]), cam,
                        flip_depth=True,
                        mask=None if mask is None else _down(mask) > 0.5)
    mats = Materials(
        jnp.asarray(_down(mat["albedo"])),
        jnp.asarray(_down(mat["roughness"])),
        jnp.asarray(_down(mat["metallic"])),
        jnp.asarray(_down(mat["normal"])),
    )
    # vectorized march + single chunk: keeps CPU *compile* time sane (the
    # TPU-default unrolled march is ~30 min of XLA-CPU compilation here)
    cfg = RenderConfig(spp=spp, chunk=spp, march_steps=16, shadow_steps=12,
                       march_vectorized=True)
    img = render(jax.random.PRNGKey(0), cfg, cam, gbuf, mats,
                 jnp.asarray(mat["envmap"]))
    return np.asarray(img)


def test_indoor_golden_psnr(indoor):
    img = _render_scene(indoor["mat"], indoor["depth"])
    ref = _down(indoor["ref"])
    scale = ref.mean() / img.mean()
    p = psnr(np.clip(img * scale, 0, 2), np.clip(ref, 0, 2))
    assert p > 22.5, f"indoor golden PSNR regressed: {p:.2f} dB"  # round-4 measured 23.27 (march thickness heuristic 0.05)
    # global exposure must be close (estimator energy parity); the finite-
    # thickness march occludes less than r3's infinite-thickness one, so
    # the render is brighter vs the (over-occluded-fit) reference render
    assert 0.80 < scale < 1.15, scale  # round-4 measured 0.838


def test_indoor_matches_gt(indoor):
    img = _render_scene(indoor["mat"], indoor["depth"])
    gt = _down(indoor["gt"])
    scale = gt.mean() / img.mean()
    p = psnr(np.clip(img * scale, 0, 2), np.clip(gt, 0, 2))
    assert p > 21.8, f"indoor-vs-gt PSNR regressed: {p:.2f} dB"  # round-4 measured 22.50


def test_jinjya_golden_psnr(reference_dir):
    base = os.path.join(reference_dir, "output_imgs", "jinjya")
    mat = load_best_results(os.path.join(base, "best_results"),
                            roughness_remap=False)
    depth = exr.read(os.path.join(base, "depthPred.exr"))
    ref = _down(exr.read(os.path.join(base, "best_results",
                                      "rendered_img.exr")))
    gt = _down(exr.read(os.path.join(base, "gt_image.exr")))
    mask = image.read(os.path.join(base, "mesh_mask.png"))
    if mask.ndim == 3:
        mask = mask[..., :1]
    else:
        mask = mask[..., None]
    img = _render_scene(mat, depth, mask=mask)
    # jinjya's rendered_img.exr is in sRGB+exposure space (material phase
    # SaveBest stores pred_image_srgb, inverse_img_w_mi.py:547)
    ratio = gt.mean() / img.mean()
    ours_srgb = np.clip(img * ratio, 0, None) ** (1 / 2.2)
    p = psnr(np.clip(ours_srgb, 0, 2), np.clip(ref, 0, 2))
    assert p > 20.5, f"jinjya golden PSNR regressed: {p:.2f} dB"  # round-5 measured 20.64 on CPU (r3: 20.77); 512² parity 19.87 (runs/forward_parity_r5.json)
