"""Two-interface dielectric insertion (render/glass.py + back-layer
rasterization): synthetic glass-sphere-over-plane golden checks.

Reference behavior: oi.ply is a smooth Mitsuba dielectric (acrylic
glass, ior 1.49) path-traced with both interfaces at max_depth=16
(render_final.py:123-136). These tests pin the TPU-native deterministic
formulation: exact Fresnel at normal incidence, straight-through
transmission at the sphere center, and REAL background distortion
(magnification) away from the center — the behavior the round-2
single-interface screen-space refraction could not produce.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.geometry.raster import rasterize
from materialist_tpu.render.glass import (fresnel_dielectric, refract,
                                          shade_glass)
from materialist_tpu.render.scene import make_gbuffer

RES = 96
IOR = 1.49


def _sphere_mesh(center, radius, n_lat=20, n_lon=40):
    """Lat-long UV sphere; returns (verts (V,3), faces (F,3))."""
    lat = np.linspace(0, np.pi, n_lat + 1)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    verts = []
    for th in lat:
        for ph in lon:
            verts.append([np.sin(th) * np.cos(ph),
                          np.cos(th),
                          np.sin(th) * np.sin(ph)])
    verts = np.asarray(verts) * radius + np.asarray(center)
    faces = []
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float64), np.asarray(faces, np.int32)


@pytest.fixture(scope="module")
def scene():
    cam = Camera(RES, RES)
    # flat background plane at z-depth 3 with vertical stripes
    depth = np.full((RES, RES), 3.0, np.float32)
    gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=False)
    # phase +3 keeps the image-center pixel mid-stripe (the near-axial
    # transmitted ray lands within ~2 px of straight-through)
    stripes = (((np.arange(RES) + 3) // 6) % 2).astype(np.float32)
    bg = np.broadcast_to(stripes[None, :, None], (RES, RES, 3)).copy()
    bg[..., 2] = 0.5          # make stripes chromatic vs the envmap
    env = jnp.full((8, 16, 3), 0.25)
    verts, faces = _sphere_mesh([0.0, 0.0, -1.6], 0.35)
    return cam, gbuf, jnp.asarray(bg), env, verts, faces


def test_fresnel_and_refract_closed_forms():
    # normal incidence: R = ((n1-n2)/(n1+n2))^2
    r0 = float(fresnel_dielectric(jnp.asarray([1.0]), 1.0 / IOR)[0])
    assert abs(r0 - ((1 - IOR) / (1 + IOR)) ** 2) < 1e-6
    # TIR beyond the critical angle (glass->air)
    crit = np.sqrt(1.0 - (1.0 / IOR) ** 2)   # cos of the critical angle
    r_tir = float(fresnel_dielectric(jnp.asarray([crit * 0.5]), IOR)[0])
    assert r_tir == 1.0
    # straight-through at normal incidence
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    t, tir = refract(d, n, 1.0 / IOR)
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(t[0]), [0, 0, -1], atol=1e-6)


def test_back_layer_geometry(scene):
    cam, _, _, _, verts, faces = scene
    fd, fn, fm = rasterize(verts, faces, cam, layer="front")
    bd, bn, bm = rasterize(verts, faces, cam, layer="back")
    c = RES // 2
    # sphere at depth 1.6, radius .35: front ~1.25, back ~1.95
    assert abs(fd[c, c] - 1.25) < 0.03
    assert abs(bd[c, c] - 1.95) < 0.03
    assert fm[c, c] and bm[c, c]
    # front normal toward camera (+z), back normal away (-z)
    assert fn[c, c, 2] > 0.9
    assert bn[c, c, 2] < -0.9
    # layers cover the same silhouette
    assert (fm == bm).mean() > 0.99


def _analytic_normals(cam, d, center):
    """Smooth sphere normals at the rasterized layer depths (the faceted
    triangle normals deflect rays by up to half a facet angle — real
    lensing, but this test wants the closed-form optics)."""
    h, w = d.shape
    uu = (np.arange(w)[None, :] + 0.5 - cam.cx) / cam.focal
    vv = -(np.arange(h)[:, None] + 0.5 - cam.cy) / cam.focal
    ray = np.stack([np.broadcast_to(uu, (h, w)),
                    np.broadcast_to(vv, (h, w)),
                    -np.ones((h, w))], -1)
    p = ray * np.where(np.isfinite(d), d, 1.0)[..., None]
    n = p - np.asarray(center)
    return (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                           1e-9)).astype(np.float32)


def test_glass_sphere_distorts_background(scene):
    cam, gbuf, bg, env, verts, faces = scene
    fd, _, _ = rasterize(verts, faces, cam, layer="front")
    bd, _, _ = rasterize(verts, faces, cam, layer="back")
    center = [0.0, 0.0, -1.6]
    fn = _analytic_normals(cam, fd, center)
    bn = _analytic_normals(cam, bd, center)
    mask = np.isfinite(fd)
    out = np.asarray(shade_glass(cam, gbuf.dist, gbuf.valid, bg, env,
                                 fd, fn, bd, bn, jnp.asarray(mask),
                                 ior=IOR))
    bg_np = np.asarray(bg)
    assert np.isfinite(out).all()
    assert (out[~mask] == 0).all()

    # center pixel: normal incidence — two refractions cancel, ~96% of
    # the straight-through background + ~4% Fresnel reflection
    c = RES // 2
    r0 = ((1 - IOR) / (1 + IOR)) ** 2
    expect = (1 - r0) * bg_np[c, c] + r0 * 0.25   # reflection sees env
    np.testing.assert_allclose(out[c, c], expect, atol=0.08)

    # distortion: a solid-glass sphere inverts/magnifies — a substantial
    # fraction of glass pixels must show a DIFFERENT background value
    # than the straight-through ray would (stripes make this detectable)
    diff = np.abs(out - bg_np).max(-1)
    frac_distorted = (diff[mask] > 0.3).mean()
    assert frac_distorted > 0.25, frac_distorted

    # energy: transmission cannot exceed the max of (bg, env) radiance
    assert out.max() <= max(float(bg_np.max()), 0.25) + 1e-3


@pytest.mark.slow
def test_render_insert_wires_glass(tmp_path, scene):
    """--mode oi end to end: writes finite image, glass region differs
    from the object-free base render."""
    from materialist_tpu.geometry.ply import write_ply
    from materialist_tpu.render.insertion import render_insert

    cam, gbuf, bg, env, verts, faces = scene
    write_ply(str(tmp_path / "oi.ply"), verts, faces)

    mat = {
        "albedo": np.full((RES, RES, 3), 0.5, np.float32),
        "roughness": np.full((RES, RES, 1), 0.8, np.float32),
        "metallic": np.zeros((RES, RES, 1), np.float32),
        "normal": np.asarray(gbuf.normal_geo, np.float32),
    }
    out = render_insert(str(tmp_path), mat, gbuf, cam, env,
                        n_iter=1, spp=2, seed=0)
    assert out.shape == (RES, RES, 3)
    assert np.isfinite(out).all()
    fd, _, _ = rasterize(verts, faces, cam, layer="front")
    mask = np.isfinite(fd)
    # the glass region must not be a flat passthrough of the base color
    inside = out[mask]
    assert inside.std() > 1e-3
