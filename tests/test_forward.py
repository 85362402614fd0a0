"""Forward rendering / editing paths: denoiser, HSV edits, transparent
BSDF, rolling relight."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera
from materialist_tpu.ops.color import hsv_to_rgb, rgb_to_hsv
from materialist_tpu.render import bsdf as bsdf_mod
from materialist_tpu.render import edits
from materialist_tpu.render.denoise import atrous_denoise
from materialist_tpu.render.forward import render_averaged
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import RenderConfig, render_with_bsdf


def _scene(h=32, w=32):
    cam = Camera(h, w)
    depth = jnp.full((h, w), 2.0)
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    mats = Materials(jnp.full((h, w, 3), 0.6), jnp.full((h, w, 1), 0.5),
                     jnp.full((h, w, 1), 0.1), gbuf.normal_geo)
    env = jnp.ones((16, 32, 3))
    return cam, gbuf, mats, env


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((16, 16, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_apply_edits_masked():
    mat = {
        "albedo": np.full((8, 8, 3), 0.5, np.float32),
        "roughness": np.full((8, 8, 1), 0.5, np.float32),
        "metallic": np.full((8, 8, 1), 0.5, np.float32),
        "mask": np.zeros((8, 8), bool),
    }
    mat["mask"][:4] = True
    flag = edits.apply_edits(mat, {"roughness": 0.9, "albedo": None,
                                   "metallic": None})
    assert "_r_0.9" in flag
    assert np.allclose(mat["roughness"][:4], 0.9)
    assert np.allclose(mat["roughness"][4:], 0.5)


def test_denoiser_reduces_noise():
    rng = np.random.default_rng(1)
    clean = np.tile(np.linspace(0, 1, 32)[:, None, None], (1, 32, 3))
    noisy = clean + rng.normal(0, 0.1, clean.shape)
    out = np.asarray(atrous_denoise(jnp.asarray(noisy.astype(np.float32))))
    assert np.mean((out - clean) ** 2) < 0.5 * np.mean((noisy - clean) ** 2)


@pytest.mark.slow
def test_render_averaged_shape():
    cam, gbuf, mats, env = _scene()
    img = render_averaged(gbuf, cam, mats, env, n_iter=2, spp=4, chunk=4)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.mean() > 0.05


@pytest.mark.slow
def test_transparent_bsdf_render():
    cam, gbuf, mats, env = _scene()
    h, w = 32, 32
    mask = jnp.zeros((h, w), bool).at[8:24, 8:24].set(True)
    bg = jnp.broadcast_to(jnp.array([1.0, 0.1, 0.1]), (h, w, 3))
    n = h * w
    bsdf = bsdf_mod.transparent(mats, bg, mask, 0.8, 1.3, cam,
                                gbuf.position.reshape(n, 3))
    cfg = RenderConfig(spp=8, chunk=4, march_steps=8, shadow_steps=8)
    img = np.asarray(render_with_bsdf(jax.random.PRNGKey(0), cfg, cam, gbuf,
                                      mats, env, bsdf))
    assert np.isfinite(img).all()
    inside = img[12:20, 12:20]
    outside = img[:6]
    # the glass region transmits the red background: redder than outside
    assert inside[..., 0].mean() / inside[..., 1].mean() > \
        outside[..., 0].mean() / outside[..., 1].mean() + 0.1


@pytest.mark.slow
def test_transparent_bsdf_ior_effect():
    """Higher ior ⇒ more Fresnel reflection; renders stay finite."""
    cam, gbuf, mats, env = _scene(16, 16)
    n = 16 * 16
    mask = jnp.ones((16, 16), bool)
    bg = jnp.full((16, 16, 3), 0.5)
    cfg = RenderConfig(spp=4, chunk=4, march_steps=4, shadow_steps=4)
    for ior in (1.1, 1.5, 2.0):
        bsdf = bsdf_mod.transparent(mats, bg, mask, 0.5, ior, cam,
                                    gbuf.position.reshape(n, 3))
        img = np.asarray(render_with_bsdf(jax.random.PRNGKey(0), cfg, cam,
                                          gbuf, mats, env, bsdf))
        assert np.isfinite(img).all()
