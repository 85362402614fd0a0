"""Transparency-edit golden (VERDICT r2 missing #6): drive the full
`cli.trans_edit.transparency_edit` on a synthetic fixture and pin its
behavior — in-mask background transmission, the keep_albedo_color /
refract_distance=100 two-step offset (MatrefractBSDF's 0.3·d-then-d,
mi_plugin.py:1083-1104,1486), the §2.10 filename contract, and a
committed golden PNG.

Reference behavior: TransBSDF (mi_plugin.py:1477-1770) — inside the mask
the object gets a glass lobe whose transmission fetches the *background
image* at doubly-refracted screen coordinates; outside, the original
Disney lobes. The golden is rendered on CPU at fixed seeds (MC is
deterministic per platform); cross-platform float drift is covered by
the PSNR threshold.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from materialist_tpu.io import exr as exr_io
from materialist_tpu.io import image as image_io

pytestmark = pytest.mark.slow  # end-to-end CLI renders (~1 min on CPU)

RES = 64
GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "trans_edit_64.png")


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Synthetic 64² scene: sloped plane, center-square mask, red-gradient
    background (spatially varying so the refracted fetch coordinate — and
    hence refract_distance — is observable)."""
    root = tmp_path_factory.mktemp("trans_scene")
    dst = root / "transfix"
    br = dst / "best_results"
    br.mkdir(parents=True)

    yy = np.linspace(0, 1, RES, dtype=np.float32)[:, None]
    depth = np.broadcast_to(2.0 + 0.8 * yy, (RES, RES)).astype(np.float32)
    exr_io.write(str(dst / "depthPred.exr"), depth[..., None])

    from materialist_tpu.camera import Camera
    from materialist_tpu.render.scene import make_gbuffer
    cam = Camera(RES, RES)
    gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=True)

    exr_io.write(str(br / "albedo.exr"),
                 np.full((RES, RES, 3), 0.45, np.float32))
    exr_io.write(str(br / "roughness.exr"),
                 np.full((RES, RES, 1), 0.6, np.float32))
    exr_io.write(str(br / "metallic.exr"),
                 np.full((RES, RES, 1), 0.1, np.float32))
    exr_io.write(str(br / "normal.exr"),
                 np.asarray(gbuf.normal_geo, np.float32))
    image_io.write(str(br / "envmap.hdr"),
                   np.full((16, 32, 3), 0.5, np.float32))

    # background: red-DOMINANT (mean R ≈ 0.7 vs G ≈ 0.2) so in-mask
    # transmission shows as a red shift, with ramps in both axes so any
    # shift of the refracted fetch coordinate changes the statistics
    xx = np.linspace(0, 1, RES, dtype=np.float32)[None, :]
    bg = np.stack([np.broadcast_to(0.4 + 0.6 * xx, (RES, RES)),
                   np.broadcast_to(0.1 + 0.2 * yy, (RES, RES)),
                   np.full((RES, RES), 0.15, np.float32)], -1)
    image_io.write(str(br / "bg.png"), bg)

    mask = np.zeros((RES, RES), np.float32)
    mask[16:48, 16:48] = 1.0
    image_io.write(str(br / "mask.png"),
                   np.repeat(mask[..., None], 3, -1), linear_input=False)
    return root, "transfix"


@pytest.fixture(scope="module")
def renders(scene_dir):
    """Both CLI runs (default and keep_albedo_color), rendered ONCE for
    the whole module — reloading config per test would recompile the
    renderer each time (minutes on the single-core CPU host)."""
    root, name = scene_dir
    os.environ["MATERIALIST_OUT_DIR"] = str(root)
    import importlib
    from materialist_tpu import config as gconfig
    importlib.reload(gconfig)
    from materialist_tpu.cli import common, trans_edit
    importlib.reload(common)
    importlib.reload(trans_edit)
    try:
        img_wo = np.asarray(trans_edit.transparency_edit(
            name, 1.2, False, 0.4, n_iter=2, spp=8))
        img_wa = np.asarray(trans_edit.transparency_edit(
            name, 1.2, True, 0.4, n_iter=2, spp=8))
    finally:
        os.environ.pop("MATERIALIST_OUT_DIR", None)
        importlib.reload(gconfig)
    return img_wo, img_wa, str(root / name)


def test_trans_edit_contract_and_stats(renders):
    img, _, out_dir = renders

    # §2.10 filename contract (trans_edit.py:66-71)
    stem = "mi_trans_1.2_woA_0.4_transfix_envmap"
    assert os.path.exists(os.path.join(out_dir, f"{stem}.exr"))
    assert os.path.exists(os.path.join(out_dir, f"{stem}.png"))

    assert np.isfinite(img).all()
    inside = img[20:44, 20:44]
    outside = np.concatenate([img[:12].reshape(-1, 3),
                              img[52:].reshape(-1, 3)])
    # in-mask background visibility: the glass lobe transmits the red-ramp
    # bg (mean red ~0.5) through specTrans=0.4 — the mask region must be
    # measurably redder relative to green than the untouched Disney region
    r_in = inside[..., 0].mean() / max(inside[..., 1].mean(), 1e-6)
    r_out = outside[..., 0].mean() / max(outside[..., 1].mean(), 1e-6)
    assert r_in > r_out + 0.05, (r_in, r_out)
    # energy sanity: bounded by (env + bg) radiance scale
    assert 0.005 < img.mean() < 2.0, img.mean()


def test_trans_edit_keep_albedo_refract_distance(renders):
    """keep_albedo_color ⇒ albedo untouched AND refract_distance=100 (the
    MatrefractBSDF-style far fetch): both the filename flag and the pixel
    statistics must change vs the default run."""
    img_wo, img_wa, out_dir = renders

    stem = "mi_trans_1.2_wA_0.4_transfix_envmap"
    assert os.path.exists(os.path.join(out_dir, f"{stem}.exr"))

    inside_wo = img_wo[20:44, 20:44]
    inside_wa = img_wa[20:44, 20:44]
    # refract_distance 1 → 100 moves the doubly-refracted fetch by many
    # pixels over a ramp background; plus albedo 0.45 (kept) vs 0.7
    delta = np.abs(inside_wa - inside_wo).mean()
    assert delta > 0.01, delta
    # outside the mask both runs are the identical Disney render
    np.testing.assert_allclose(img_wa[:12], img_wo[:12], atol=1e-5)


def test_trans_edit_matches_committed_golden(renders):
    """Pin the full render against the committed golden PNG. Regenerate
    with: MATERIALIST_UPDATE_GOLDEN=1 pytest tests/test_trans_edit_golden.py
    (only when a deliberate estimator change shifts the image)."""
    img, _, _ = renders
    srgb = np.clip(img, 0.0, 1.0) ** (1 / 2.2)
    if os.environ.get("MATERIALIST_UPDATE_GOLDEN") == "1" \
            or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        image_io.write(GOLDEN, srgb, linear_input=False)
        pytest.skip("golden (re)written — commit tests/golden/")
    gold = image_io.read(GOLDEN)[..., :3]
    if gold.ndim == 2:
        gold = gold[..., None].repeat(3, -1)
    # image_io.read returns PNG values AS STORED (no transfer decode) —
    # both sides are already in the written display space
    mse = float(np.mean((srgb - gold) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"trans_edit drifted from golden: {psnr:.2f} dB"
