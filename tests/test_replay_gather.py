"""Path-replay reuse-gather: the free-forward custom-VJP gather must give
the same image and material gradients as a plain differentiable gather."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera
from materialist_tpu.render import bsdf as bsdf_mod
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import RenderConfig, render_with_bsdf


def _scene(res=24):
    cam = Camera(res, res)
    depth = 2.0 + jax.random.uniform(jax.random.PRNGKey(0), (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    mats = Materials(jnp.full((res, res, 3), 0.6),
                     jnp.full((res, res, 1), 0.5),
                     jnp.full((res, res, 1), 0.2), gbuf.normal_geo)
    env = jnp.ones((8, 16, 3)) * jnp.linspace(0.3, 2.0, 8)[:, None, None]
    return cam, gbuf, mats, env


def _loss(mats, env, cam, gbuf, cfg, disable_reuse):
    b = bsdf_mod.disney(mats)
    if disable_reuse:
        b = b._replace(gather_reuse=None, table=b.table)
    img = render_with_bsdf(jax.random.PRNGKey(7), cfg, cam, gbuf, mats,
                           env, bsdf=b)
    return jnp.mean(img ** 2)


@pytest.mark.slow
def test_reuse_gather_matches_plain_gather():
    cam, gbuf, mats, env = _scene()
    cfg = RenderConfig(spp=4, chunk=2, max_depth=3, march_steps=6,
                       shadow_steps=4, march_vectorized=True)

    v1, g1 = jax.value_and_grad(_loss, argnums=(0, 1))(
        mats, env, cam, gbuf, cfg, False)
    v2, g2 = jax.value_and_grad(_loss, argnums=(0, 1))(
        mats, env, cam, gbuf, cfg, True)

    # bf16-rounded replay rows introduce ~1e-3 relative drift, nothing more
    assert abs(float(v1) - float(v2)) < 2e-3 * max(abs(float(v2)), 1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        denom = max(float(jnp.abs(b).max()), 1e-6)
        assert float(jnp.abs(a - b).max()) < 5e-2 * denom + 1e-4


def test_reuse_gather_bwd_is_exact_scatter():
    """Direct check of the custom VJP: grad wrt table == scatter of cot."""
    table = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    idx = jax.random.randint(jax.random.PRNGKey(1), (5, 16), 0, 32)
    primal = table[idx]

    def f(t):
        out = bsdf_mod._reuse_gather(t, idx, primal)
        return jnp.sum(out ** 2 * 0.5)

    g = jax.grad(f)(table)
    # reference: accumulate primal rows at idx
    ref = np.zeros((32, 8), np.float32)
    np.add.at(ref, np.asarray(idx).reshape(-1),
              np.asarray(primal).reshape(-1, 8))
    np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-5, atol=1e-5)
