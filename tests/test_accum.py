"""Host-level gradient accumulation must be EXACT: the split (trace-once,
records-cached) accumulation's loss and gradients equal a single
value_and_grad over the same total spp with the same per-group keys.

Covers VERDICT r2 weak #4 (the double-render fix must not change the
math) and the trace/shade split entry points themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.opt.accum import (make_accum_value_and_grad,
                                       make_accum_value_and_grad_scan,
                                       make_accum_value_and_grad_split)
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import (RenderConfig, render_with_bsdf,
                                           shade_from_records,
                                           trace_step_records)


def _scene(res=16):
    cam = Camera(res, res)
    depth = 2.0 + jax.random.uniform(jax.random.PRNGKey(0), (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    mats = Materials(jnp.full((res, res, 3), 0.6),
                     jnp.full((res, res, 1), 0.5),
                     jnp.full((res, res, 1), 0.2), gbuf.normal_geo)
    env = jnp.ones((8, 16, 3)) * jnp.linspace(0.3, 2.0, 8)[:, None, None]
    gt = jnp.full((res, res, 3), 0.25)
    return cam, gbuf, mats, env, gt


CFG = RenderConfig(spp=4, chunk=2, max_depth=3, march_steps=6,
                   shadow_steps=4, march_vectorized=True)


def test_split_render_equals_composed():
    """shade(trace(...)) == render_with_bsdf(...) bitwise (same keys)."""
    cam, gbuf, mats, env, _ = _scene()
    key = jax.random.PRNGKey(3)
    img1 = render_with_bsdf(key, CFG, cam, gbuf, mats, env)
    recs = trace_step_records(key, CFG, cam, gbuf, mats, env)
    img2 = shade_from_records(key, recs, CFG, cam, gbuf, mats, env)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def _accum_setup():
    cam, gbuf, mats, env, gt = _scene()
    gt_srgb = linear_to_srgb(gt)
    params = {"mats": mats, "envmap": env}

    def loss_of_img(img):
        pred = linear_to_srgb(img)
        return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(
            jnp.abs(pred - gt_srgb))

    def trace_fn(p, key):
        return trace_step_records(key, CFG, cam, gbuf, p["mats"],
                                  p["envmap"])

    def shade_fn(p, recs, key):
        return shade_from_records(key, recs, CFG, cam, gbuf, p["mats"],
                                  p["envmap"])

    def render_fn(p, key):
        return render_with_bsdf(key, CFG, cam, gbuf, p["mats"], p["envmap"])

    # reference: single host-level value_and_grad over the mean of the
    # same per-group renders (identical keys => identical estimator)
    def ref_loss(p, key):
        keys = jax.random.split(key, 3)
        img = sum(render_fn(p, k) for k in keys) / 3
        return loss_of_img(img)

    return params, loss_of_img, trace_fn, shade_fn, render_fn, ref_loss


def test_split_accum_matches_monolithic_grad():
    params, loss_of_img, trace_fn, shade_fn, render_fn, ref_loss = \
        _accum_setup()
    key = jax.random.PRNGKey(11)
    ref_l, ref_g = jax.value_and_grad(ref_loss)(params, key)

    vg = make_accum_value_and_grad_split(trace_fn, shade_fn, loss_of_img, 3)
    l, g = vg(params, key)

    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_split_accum_matches_legacy_retrace_accum():
    """Cached-records mode == re-trace mode == legacy render-twice accum."""
    params, loss_of_img, trace_fn, shade_fn, render_fn, _ = _accum_setup()
    key = jax.random.PRNGKey(5)

    l1, g1 = make_accum_value_and_grad_split(
        trace_fn, shade_fn, loss_of_img, 2, keep_records=True)(params, key)
    l2, g2 = make_accum_value_and_grad_split(
        trace_fn, shade_fn, loss_of_img, 2, keep_records=False)(params, key)
    l3, g3 = make_accum_value_and_grad(render_fn, loss_of_img, 2)(
        params, key)

    assert float(l1) == float(l2)
    np.testing.assert_allclose(float(l1), float(l3), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_scan_accum_matches_split():
    """The single-dispatch lax.scan accumulation (one jit per step) must
    reproduce the host-level split accumulation's loss and gradients —
    both fresh-trace and with persistent (trace_all) records."""
    params, loss_of_img, trace_fn, shade_fn, render_fn, _ = _accum_setup()
    key = jax.random.PRNGKey(13)

    vg_split = make_accum_value_and_grad_split(trace_fn, shade_fn,
                                               loss_of_img, 3)
    vg_scan = make_accum_value_and_grad_scan(trace_fn, shade_fn,
                                             loss_of_img, 3)
    l1, g1 = vg_split(params, key)
    l2, g2 = vg_scan(params, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    recs = vg_scan.trace_all(params, key)
    l3, g3 = vg_scan(params, key, records=recs)
    np.testing.assert_allclose(float(l2), float(l3), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_accum_persistent_records_match_fresh():
    """trace_all + records= (the trace_every amortization of the accum
    path) must reproduce the fresh-trace step bitwise at the same key."""
    params, loss_of_img, trace_fn, shade_fn, render_fn, _ = _accum_setup()
    key = jax.random.PRNGKey(7)

    vg = make_accum_value_and_grad_split(trace_fn, shade_fn, loss_of_img, 3)
    l1, g1 = vg(params, key)
    recs = vg.trace_all(params, key)
    l2, g2 = vg(params, key, records=recs)

    assert float(l1) == float(l2)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
