"""Spherical-harmonics tests: orthonormality, projection round trips,
z-rotation equivalence with envmap rolling."""

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.ops import envmap as em
from materialist_tpu.ops import sh


def _rand_dirs(n, seed=0):
    d = jax.random.normal(jax.random.PRNGKey(seed), (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_basis_orthonormal():
    """MC check: ∫ Y_i Y_j dω = δ_ij."""
    d = _rand_dirs(200_000)
    y = sh.sh_basis(d, l_max=2)  # (n, 9)
    gram = np.asarray((y[:, :, None] * y[:, None, :]).mean(0) * 4 * np.pi)
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_project_constant_envmap():
    env = jnp.ones((16, 32, 3)) * 2.0
    coef = sh.project_envmap(env, l_max=2)
    # DC coefficient of a constant: c00 = L·√(4π); others ~0
    # 16×32 texel-center quadrature: ~0.2% DC error, small band leakage
    np.testing.assert_allclose(np.asarray(coef[0]),
                               2.0 * np.sqrt(4 * np.pi), rtol=5e-3)
    assert np.abs(np.asarray(coef[1:])).max() < 0.05


def test_reconstruction_roundtrip_lowfreq():
    """A band-limited envmap survives project→reconstruct."""
    h, w = 16, 32
    coef_true = jax.random.normal(jax.random.PRNGKey(1), (9, 3)) * 0.3
    coef_true = coef_true.at[0].add(2.0)
    env = sh.reconstruct_envmap(coef_true, h, w, l_max=2, clip=False)
    coef = sh.project_envmap(env, l_max=2)
    np.testing.assert_allclose(np.asarray(coef), np.asarray(coef_true),
                               atol=0.05)


def test_rotate_z_matches_envmap_roll():
    """SH-rotating by 90° ≍ rolling the envmap by W/4 columns."""
    key = jax.random.PRNGKey(2)
    coef = jax.random.normal(key, (9, 3)) * 0.2
    coef = coef.at[0].add(1.0)
    h, w = 32, 64
    env = sh.reconstruct_envmap(coef, h, w, l_max=2, clip=False)
    rolled = em.rotate(env, 90.0)
    coef_rot = sh.rotate_z(coef, np.deg2rad(90.0))
    env_rot = sh.reconstruct_envmap(coef_rot, h, w, l_max=2, clip=False)
    err = np.abs(np.asarray(env_rot) - np.asarray(rolled)).max()
    assert err < 0.05, err


def test_irradiance_positive_for_positive_light():
    env = jnp.ones((16, 32, 3))
    coef = sh.project_envmap(env, l_max=2)
    n = _rand_dirs(1000, seed=3)
    e = sh.irradiance(coef, n, l_max=2)
    # constant unit radiance ⇒ E = π on every normal
    np.testing.assert_allclose(np.asarray(e), np.pi, rtol=0.05)
