"""Object-insertion tests: rasterizer correctness + composited render."""

import numpy as np
import pytest
import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.geometry.raster import rasterize
from materialist_tpu.render.insertion import composite_gbuffer, \
    render_insert
from materialist_tpu.render.scene import Materials, make_gbuffer


def _quad(z=-1.5, half=0.3):
    """Two triangles forming a square facing the camera at depth |z|."""
    v = np.array([[-half, -half, z], [half, -half, z],
                  [half, half, z], [-half, half, z]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return v, f


def test_rasterize_quad_center():
    cam = Camera(64, 64)
    v, f = _quad(z=-2.0, half=0.2)
    dist, normal, mask = rasterize(v, f, cam)
    # center pixel covered at distance 2, normal facing camera (+z)
    assert mask[32, 32]
    np.testing.assert_allclose(dist[32, 32], 2.0, rtol=1e-4)
    np.testing.assert_allclose(normal[32, 32], [0, 0, 1], atol=1e-5)
    # corners not covered
    assert not mask[2, 2]


def test_rasterize_zbuffer_order():
    cam = Camera(32, 32)
    near = _quad(z=-1.0, half=0.2)
    far = _quad(z=-3.0, half=0.4)
    d1, _, _ = rasterize(np.vstack([near[0], far[0]]),
                         np.vstack([near[1], far[1] + 4]), cam)
    np.testing.assert_allclose(d1[16, 16], 1.0, rtol=1e-4)


@pytest.mark.slow
def test_composite_and_render(tmp_path):
    import jax
    from materialist_tpu.geometry.ply import write_ply

    h = w = 32
    cam = Camera(h, w)
    gbuf = make_gbuffer(jnp.full((h, w), 3.0), cam, flip_depth=False)
    v, f = _quad(z=-1.5, half=0.15)
    write_ply(str(tmp_path / "oi2.ply"), v, f)

    mat = {
        "albedo": np.full((h, w, 3), 0.4, np.float32),
        "roughness": np.full((h, w, 1), 0.6, np.float32),
        "metallic": np.full((h, w, 1), 0.0, np.float32),
        "normal": np.asarray(gbuf.normal_geo),
    }
    img = render_insert(str(tmp_path), mat, gbuf, cam,
                        jnp.ones((16, 32, 3)), n_iter=1, spp=4)
    assert img.shape == (h, w, 3) and np.isfinite(img).all()
    # the inserted 0.8-grey object is brighter than the 0.4 scene
    assert img[16, 16].mean() > img[2, 2].mean()
