"""Screen-space marcher tests: analytic hit/miss cases for both the exact
and mip implementations, and the pallas-gather CPU fallback."""

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera
from materialist_tpu.ops.pallas.gather import onehot_gather
from materialist_tpu.render import screenspace as ss
from materialist_tpu.render.scene import make_gbuffer


def _wall_scene(h=64, w=64):
    """Flat plane at distance 2 with a closer wall on the right half."""
    cam = Camera(h, w)
    dist = jnp.full((h, w), 2.0)
    dist = dist.at[:, w // 2:].set(1.0)
    valid = jnp.ones((h, w), bool)
    return cam, dist, valid


def _origins_dirs(cam, dist):
    gbuf = make_gbuffer(dist, cam, flip_depth=False)
    # start at the deep plane's left-quarter pixels, shoot rays toward +x
    # (toward the closer wall — in world coords the wall at u>w/2 has x>0)
    pos = gbuf.position[:, : cam.width // 4].reshape(-1, 3)
    d = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.3]), pos.shape)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return pos, d


def test_exact_march_hits_wall():
    cam, dist, valid = _wall_scene()
    pos, d = _origins_dirs(cam, dist)
    hit = ss.march(cam, dist, valid, pos, d, n_steps=24)
    assert float(hit.hit.mean()) > 0.8
    # hit pixels are on the wall half
    cols = hit.idx % cam.width
    assert (np.asarray(cols[np.asarray(hit.hit)]) >= cam.width // 2 - 1).all()


def test_mip_march_matches_exact_mostly():
    cam, dist, valid = _wall_scene()
    pos, d = _origins_dirs(cam, dist)
    exact = ss.march(cam, dist, valid, pos, d, n_steps=24)
    mip = ss.build_min_mip(dist, valid, 4)
    fast = ss.march_mip(cam, dist, valid, mip, pos, d, n_steps=24,
                        fine_steps=8, mip_factor=4)
    agree = np.asarray(exact.hit == fast.hit).mean()
    assert agree > 0.9, agree


def test_march_misses_into_sky():
    cam, dist, valid = _wall_scene()
    gbuf = make_gbuffer(dist, cam, flip_depth=False)
    pos = gbuf.position[:, : cam.width // 4].reshape(-1, 3)
    # rays straight up leave the frustum without crossing geometry
    d = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.1]), pos.shape)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    for impl in ("exact", "mip"):
        if impl == "exact":
            hit = ss.march(cam, dist, valid, pos, d, n_steps=24)
        else:
            mip = ss.build_min_mip(dist, valid, 4)
            hit = ss.march_mip(cam, dist, valid, mip, pos, d, n_steps=24)
        assert float(hit.hit.mean()) < 0.05, impl


def test_occluded_shadow_ray():
    cam, dist, valid = _wall_scene()
    pos, d = _origins_dirs(cam, dist)
    occ = ss.occluded(cam, dist, valid, pos, d, n_steps=16)
    assert float(occ.mean()) > 0.7


def test_onehot_gather_fallback_matches_indexing():
    key = jax.random.PRNGKey(0)
    table = jax.random.uniform(key, (32, 16))
    idx = jax.random.randint(key, (100,), 0, 32 * 16)
    out = onehot_gather(table, idx)
    ref = np.asarray(table).reshape(-1)[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
    t3 = jax.random.uniform(key, (32, 16, 3))
    out3 = onehot_gather(t3, idx)
    ref3 = np.asarray(t3).reshape(-1, 3)[np.asarray(idx)]
    np.testing.assert_allclose(np.asarray(out3), ref3, atol=1e-6)
