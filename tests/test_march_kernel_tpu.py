"""Fused march kernel vs the march_mip reference path — on the real TPU.

The CPU fallback of march_fused IS march_mip, so CPU CI cannot catch a
kernel/fallback divergence; this test runs only where a TPU is attached
(`pytest -m tpu`). Asserts hit/idx agreement on real fixture geometry and
on a discontinuous silhouette scene (the thickness-heuristic case).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.ops.pallas.march_kernel import (march_fused,
                                                     _fine_factor,
                                                     _mip_factor)
from materialist_tpu.render import screenspace as ss
from materialist_tpu.render.scene import make_gbuffer

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="fused kernel only runs on TPU"),
]


def _agreement(dist, valid, cam, pos, d, n_steps=16, fine_steps=6):
    hf = march_fused(cam, dist, valid, pos, d, n_steps=n_steps,
                     fine_steps=fine_steps)
    mip_f, fine_f = _mip_factor(*dist.shape), _fine_factor(*dist.shape)
    mip = ss.build_min_mip(dist, valid, mip_f)
    fine = ss.build_fine_table(dist, valid, fine_f)
    hm = ss.march_mip(cam, dist, valid, mip, pos, d, n_steps=n_steps,
                      fine_steps=fine_steps, mip_factor=mip_f,
                      fine_table=fine, fine_factor=fine_f)
    ha, hb = np.asarray(hf.hit), np.asarray(hm.hit)
    hit_agree = (ha == hb).mean()
    both = ha & hb
    idx_agree = (np.asarray(hf.idx)[both] == np.asarray(hm.idx)[both]).mean()
    return hit_agree, idx_agree


def test_kernel_matches_mip_on_silhouette():
    res = 128
    cam = Camera(res, res)
    depth = jnp.where(jnp.arange(res)[None, :] < res // 2, 2.0, 6.0)
    depth = jnp.broadcast_to(depth, (res, res)).astype(jnp.float32)
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    n = res * res
    pos = gbuf.position.reshape(n, 3)
    d = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit_agree, idx_agree = _agreement(gbuf.dist, gbuf.valid, cam, pos, d)
    assert hit_agree > 0.995, hit_agree
    assert idx_agree > 0.99, idx_agree


def test_kernel_matches_mip_on_fixture():
    from materialist_tpu.io import exr
    import os
    p = "/root/reference/output_imgs/indoor/depthPred.exr"
    if not os.path.exists(p):
        pytest.skip("reference fixtures unavailable")
    depth = jnp.asarray(exr.read(p))[..., 0]
    cam = Camera(512, 512)
    gbuf = make_gbuffer(depth, cam, flip_depth=True)
    n = 512 * 512
    pos = gbuf.position.reshape(n, 3)
    d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit_agree, idx_agree = _agreement(gbuf.dist, gbuf.valid, cam, pos, d,
                                      n_steps=24, fine_steps=6)
    assert hit_agree > 0.995, hit_agree
    assert idx_agree > 0.99, idx_agree


def test_pair_kernel_matches_v2_on_fixture():
    """march_pair (v3: paired lobe+shadow, R-row blocks, broadcast-row
    lookups) must be bit-identical to two march_fused (v2) calls."""
    from materialist_tpu.ops.pallas.march_kernel import march_pair
    from materialist_tpu.io import exr
    import os
    p = "/root/reference/output_imgs/indoor/depthPred.exr"
    if not os.path.exists(p):
        pytest.skip("reference fixtures unavailable")
    depth = jnp.asarray(exr.read(p))[..., 0]
    cam = Camera(512, 512)
    gbuf = make_gbuffer(depth, cam, flip_depth=True)
    n = 512 * 512
    pos = gbuf.position.reshape(n, 3)
    dl = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
    dl = dl / jnp.linalg.norm(dl, axis=-1, keepdims=True)
    dn = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    dn = dn / jnp.linalg.norm(dn, axis=-1, keepdims=True)

    h3, s3 = march_pair(cam, gbuf.dist, gbuf.valid, pos, dl, dn,
                        n_steps=24, fine_steps=6, shadow_steps=16,
                        shadow_fine_steps=2)
    h2 = march_fused(cam, gbuf.dist, gbuf.valid, pos, dl,
                     n_steps=24, fine_steps=6)
    s2 = march_fused(cam, gbuf.dist, gbuf.valid, pos, dn,
                     n_steps=16, fine_steps=2).hit
    np.testing.assert_array_equal(np.asarray(h3.hit), np.asarray(h2.hit))
    both = np.asarray(h3.hit) & np.asarray(h2.hit)
    np.testing.assert_array_equal(np.asarray(h3.idx)[both],
                                  np.asarray(h2.idx)[both])
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(s2))
