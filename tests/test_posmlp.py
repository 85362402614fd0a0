"""PosMLP model tests: shapes, zero-init head behavior, straight-through
gradients, and parity of the positional embedding with the reference's
Embedder semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.models import posmlp


def test_envmap_net_initial_output():
    """Zero-init last layer ⇒ initial envmap = softplus(0) ≈ 0.693."""
    net = posmlp.make_envmap_net()
    x = jnp.ones((16 * 32, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (512, 3)
    np.testing.assert_allclose(np.asarray(out), np.log(2.0), atol=1e-5)


def test_arm_net_initial_is_identity():
    """Zero-init last layer + residual head ⇒ initial output = clamped input."""
    net = posmlp.make_brdf_net("arm")
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (512 * 512 // 256,
                                                            5)), 0, 1)
    # fake a small square image: 32*32=1024 rows... use 1024 (32²)
    x = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (1024, 5)), 0, 1)
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_armn_net_shapes():
    net = posmlp.make_brdf_net("armn")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1024, 8))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (1024, 8)


def test_straight_through_clamp_gradient():
    f = lambda x: posmlp._straight_through_clamp(x).sum()
    g = jax.grad(f)(jnp.array([-0.5, 0.5, 1.5]))
    # straight-through: gradient is 1 everywhere (pass-through)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    y = posmlp._straight_through_clamp(jnp.array([-0.5, 0.5, 1.5]))
    np.testing.assert_allclose(np.asarray(y), [0.0, 0.5, 1.0])


def test_positional_embed_matches_reference_semantics():
    """[x, sin(2^k x), cos(2^k x)] ordering (mlps.py:24-35)."""
    x = jnp.array([[1.0, 2.0]])
    e = posmlp.positional_embed(x, 2)
    expect = np.concatenate([
        [1.0, 2.0], np.sin([1.0, 2.0]), np.cos([1.0, 2.0]),
        np.sin([2.0, 4.0]), np.cos([2.0, 4.0])])
    np.testing.assert_allclose(np.asarray(e)[0], expect, atol=1e-6)


def test_grid_coords_envmap_shape_inference():
    net = posmlp.make_envmap_net()
    c = net.grid_coords(16 * 32)
    assert c.shape == (512, 2)
    assert float(c[:, 0].max()) == 15 and float(c[:, 1].max()) == 31


def test_envmap_net_trains():
    """A few Adam steps reduce a simple fitting loss."""
    import optax
    net = posmlp.make_envmap_net()
    x = jnp.ones((512, 3))
    target = jnp.linspace(0.2, 2.0, 512 * 3).reshape(512, 3)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss(p):
            return ((net.apply({"params": p}, x) - target) ** 2).mean()
        l, g = jax.value_and_grad(loss)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    l0 = None
    for i in range(60):
        params, state, l = step(params, state)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.5 * l0
