"""Wavefront path compaction (RenderConfig.compact_caps): the compacted
estimator must agree with the uncompacted one — same per-ray draws, same
marches, same records — up to film-scatter summation order.

Design: after each lobe march the dead rays (miss) are dropped by a
stable partition; every reordering the pipeline needs is then a coherent
(ascending-index) span gather/scatter (ops/pallas/rowops.py). See
render/shader.py::RenderConfig.compact_caps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import (RenderConfig, render_with_bsdf,
                                           probe_compact_caps)

BASE = dict(spp=4, chunk=2, max_depth=4, march_impl="exact",
            march_vectorized=True, march_steps=8, shadow_steps=6,
            film_jitter=0.5)


def _scene(res=48):
    cam = Camera(res, res)
    key = jax.random.PRNGKey(0)
    depth = 2.0 + jax.random.uniform(key, (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    mats = Materials(jnp.full((res, res, 3), 0.6),
                     jnp.full((res, res, 1), 0.4),
                     jnp.full((res, res, 1), 0.2), gbuf.normal_geo)
    env = 0.5 + jax.random.uniform(jax.random.fold_in(key, 1), (16, 32, 3))
    return cam, gbuf, mats, env


def test_compact_forward_matches_uncompacted():
    cam, gbuf, mats, env = _scene()
    key = jax.random.PRNGKey(3)
    img0 = render_with_bsdf(key, RenderConfig(**BASE), cam, gbuf, mats, env)
    img1 = render_with_bsdf(key, RenderConfig(**BASE,
                                              compact_caps=(1.0, 1.0)),
                            cam, gbuf, mats, env)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               rtol=1e-5, atol=1e-5)


def test_compact_gradients_match():
    cam, gbuf, mats, env = _scene(32)
    key = jax.random.PRNGKey(4)

    def grads(cfg):
        def f(a, e):
            img = render_with_bsdf(
                key, cfg, cam, gbuf,
                Materials(a, mats.roughness, mats.metallic, mats.normal), e)
            return jnp.mean(img ** 2)
        return jax.grad(f, argnums=(0, 1))(mats.albedo, env)

    g0a, g0e = grads(RenderConfig(**BASE))
    g1a, g1e = grads(RenderConfig(**BASE, compact_caps=(1.0, 1.0)))
    sa = float(jnp.max(jnp.abs(g0a)))
    se = float(jnp.max(jnp.abs(g0e)))
    np.testing.assert_allclose(np.asarray(g1a), np.asarray(g0a),
                               atol=2e-3 * sa)
    np.testing.assert_allclose(np.asarray(g1e), np.asarray(g0e),
                               atol=2e-3 * se)


def test_tight_caps_degrade_gracefully():
    """Caps below the true alive fraction drop rays (treated dead) — the
    image must stay finite and close to the reference, never corrupt."""
    cam, gbuf, mats, env = _scene()
    key = jax.random.PRNGKey(5)
    img0 = render_with_bsdf(key, RenderConfig(**BASE), cam, gbuf, mats, env)
    img2 = render_with_bsdf(key, RenderConfig(**BASE,
                                              compact_caps=(0.25, 0.1)),
                            cam, gbuf, mats, env)
    assert bool(jnp.all(jnp.isfinite(img2)))
    # dropped rays lose (gated) radiance: the image can only dim slightly
    rel = float(jnp.mean(jnp.abs(img2 - img0)) / (jnp.mean(img0) + 1e-9))
    assert rel < 0.2, rel


def test_probe_compact_caps():
    cam, gbuf, mats, env = _scene()
    caps = probe_compact_caps(jax.random.PRNGKey(6), RenderConfig(**BASE),
                              cam, gbuf, mats, env)
    assert len(caps) == 2
    assert all(0.0 < c <= 1.0 for c in caps)
    # caps are margin-inflated alive fractions: bounce 2 can't exceed 1
    assert caps[1] <= 1.0
