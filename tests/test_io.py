"""IO layer tests: native EXR codec (incl. decoding the reference's
PIZ-compressed fixtures), HDR/PNG round trips, resize parity helpers."""

import os

import numpy as np
import pytest

from materialist_tpu.io import exr, image, video


def test_exr_roundtrip_float(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.random((37, 65, 3)).astype(np.float32)) * 10 - 2
    p = str(tmp_path / "t.exr")
    exr.write(p, x)
    y = exr.read(p)
    np.testing.assert_array_equal(x, y)


def test_exr_roundtrip_half(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.random((16, 16, 1)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write(p, x, half=True)
    y = exr.read(p)
    assert y.shape == (16, 16, 1)
    np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-4)


def test_exr_roundtrip_large_multiblock(tmp_path):
    """>16 scanlines exercises multiple ZIP blocks."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 40, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write(p, x)
    np.testing.assert_array_equal(exr.read(p), x)


def test_decode_reference_piz_fixtures(reference_dir):
    """The shipped best_results EXRs are PIZ-compressed Mitsuba output."""
    base = os.path.join(reference_dir, "output_imgs", "indoor")
    img = exr.read(os.path.join(base, "best_results", "rendered_img.exr"))
    assert img.shape == (512, 512, 3)
    assert np.isfinite(img).all() and img.max() > 0.5
    rough = exr.read(os.path.join(base, "best_results", "roughness.exr"))
    assert rough.shape == (512, 512, 1)
    assert rough.min() >= 0.07 - 1e-5 and rough.max() <= 1.0 + 1e-5


def test_piz_decode_matches_png_fixture(reference_dir):
    """gt_image.png is the sRGB-encoded gt_image.exr: byte-exact cross-check
    of the PIZ decoder against an independently-readable file."""
    base = os.path.join(reference_dir, "output_imgs", "jinjya")
    lin = exr.read(os.path.join(base, "gt_image.exr"))
    png = image.read(os.path.join(base, "gt_image.png"))[..., :3]
    err = np.abs(image.srgb_encode(lin) - png).max()
    assert err < 1.5 / 255.0, err


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.random((16, 32, 3)).astype(np.float32)) * 4 + 0.05
    p = str(tmp_path / "t.hdr")
    image.write(p, x)
    y = image.read(p)
    # RGBE shares one exponent across channels: error scales with the
    # brightest channel of each pixel, ~1/128 of it.
    scale = x.max(axis=-1, keepdims=True)
    assert (np.abs(y - x) <= scale / 64.0 + 1e-3).all()


def test_read_reference_envmap_hdr(reference_dir):
    env = image.read(os.path.join(reference_dir, "output_imgs", "indoor",
                                  "best_results", "envmap.hdr"))
    assert env.shape == (16, 32, 3) and env.max() > 1.0


def test_png_srgb_roundtrip(tmp_path):
    x = np.linspace(0, 1, 64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    p = str(tmp_path / "t.png")
    image.write(p, x, linear_input=True)
    y = image.srgb_decode(image.read(p))
    np.testing.assert_allclose(y, x, atol=0.01)


def test_center_crop_and_resize_shape():
    img = np.random.default_rng(4).random((300, 400, 3)).astype(np.float32)
    out = image.center_crop_and_resize(img, (512, 512))
    assert out.shape == (512, 512, 3)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(5)
    x = rng.random((37, 53, 3)).astype(np.float32)
    ours = image.resize_bilinear_align_corners(x, (64, 96))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], size=(64, 96),
        mode="bilinear", align_corners=True)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_video_writer(tmp_path):
    paths = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.png")
        image.write(p, np.full((32, 32, 3), i / 4, np.float32),
                    linear_input=False)
        paths.append(p)
    out = video.write_video(paths, str(tmp_path / "v.mp4"), fps=5)
    assert os.path.exists(out) and os.path.getsize(out) > 0
