"""Multi-device sharding tests (8 virtual CPU devices via conftest).

Regression coverage for the round-1 advisor finding: the spp-sharded train
step must all-reduce gradients before the optax update, otherwise the
"replicated" params silently diverge per device.
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
from materialist_tpu.parallel.sharding import (make_sharded_train_step,
                                               px_sharded_render,
                                               spp_sharded_render)
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import RenderConfig


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


def test_spp_sharded_render_finite(ndev):
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=ndev, chunk=1, max_depth=2, march_steps=4,
                       shadow_steps=3, march_vectorized=True)
    mesh = make_mesh(ndev, axis="spp")
    rend = spp_sharded_render(mesh, cfg, cam)
    with mesh:
        img = rend(jax.random.PRNGKey(0), gbuf, mats, envmap)
        img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0


def test_px_sharded_render_finite(ndev):
    cam, gbuf, mats, envmap = _toy()
    cfg = RenderConfig(spp=2, chunk=1, max_depth=2, march_steps=4,
                       shadow_steps=3, march_vectorized=True)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("px",))
    rend = px_sharded_render(mesh, cfg, cam)
    with mesh:
        img = rend(jax.random.PRNGKey(2), gbuf, gbuf.dist, gbuf.valid,
                   mats, envmap)
        img = np.asarray(img)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
