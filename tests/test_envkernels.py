"""Pallas envmap sample/pdf kernels must match the XLA one-hot reference
semantics (ops/envmap.py). Interpret mode on CPU; `-m tpu` re-checks
compiled on hardware."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.ops import envmap as em
from materialist_tpu.ops.pallas import envkernels as ek


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ek, "_INTERPRET", True)


@pytest.mark.parametrize("hw", [(16, 32), (8, 16)])
def test_sample_dir_matches_reference(hw):
    h, w = hw
    key = jax.random.PRNGKey(0)
    envmap = jax.random.uniform(key, (h, w, 3)) ** 2 * 3.0
    sampler = em.build_sampler(envmap)
    u2 = jax.random.uniform(jax.random.PRNGKey(1), (5, 700, 2))

    wi_ref, pdf_ref = em.sample_dir(sampler, u2)
    wi, pdf = ek.env_sample_dir(sampler, u2)

    np.testing.assert_allclose(np.asarray(wi), np.asarray(wi_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_ref),
                               rtol=2e-4, atol=1e-6)


def test_pdf_dir_matches_reference():
    h, w = 16, 32
    envmap = jax.random.uniform(jax.random.PRNGKey(2), (h, w, 3)) * 2.0
    sampler = em.build_sampler(envmap)
    d = jax.random.normal(jax.random.PRNGKey(3), (3000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    pdf_ref = em.pdf_dir(sampler, d)
    pdf = ek.env_pdf_dir(sampler, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf_ref),
                               rtol=3e-4, atol=1e-6)


def test_sample_dir_pdf_is_consistent_density():
    """MC sanity: E[1/pdf] over samples ≈ 4π (the pdf really is the
    density of the sampler's own decisions)."""
    h, w = 16, 32
    envmap = jax.random.uniform(jax.random.PRNGKey(4), (h, w, 3)) + 0.05
    sampler = em.build_sampler(envmap)
    u2 = jax.random.uniform(jax.random.PRNGKey(5), (200_000, 2))
    _, pdf = ek.env_sample_dir(sampler, u2)
    est = float(jnp.mean(1.0 / jnp.maximum(pdf, 1e-9)))
    assert abs(est - 4 * np.pi) < 0.35


@pytest.mark.parametrize("hw", [(16, 32), (64, 64), (4, 8)])
def test_lookup_bilinear_kernel_matches_reference(hw):
    """The fused bilinear fetch must match the XLA one-hot lookup (which
    quantizes weighted one-hots to bf16 — the kernel is exact f32, so
    tolerance is the bf16 rounding of the reference, not the kernel)."""
    h, w = hw
    envmap = jax.random.uniform(jax.random.PRNGKey(6), (h, w, 3)) * 4.0
    d = jax.random.normal(jax.random.PRNGKey(7), (7, 555, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = em.lookup_bilinear(envmap, d)  # XLA path (cpu backend in tests)

    u, v = em.dir_to_uv(d, h, w)
    uf, vf = u - 0.5, v - 0.5
    u0, v0 = jnp.floor(uf), jnp.floor(vf)
    du, dv = uf - u0, vf - v0
    u0i = jnp.mod(u0.astype(jnp.int32), w)
    u1i = jnp.mod(u0i + 1, w)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, h - 1)
    v1i = jnp.clip(v0i + 1, 0, h - 1)
    planes = ek.env_lookup_planes(envmap)
    out = ek.env_lookup_bilinear_tpu(planes, u0i, u1i, v0i, v1i, du, dv,
                                     h, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    # exact check against a pure-f32 4-tap fetch
    flat = envmap.reshape(h * w, 3)
    dud = du[..., None]
    dvd = dv[..., None]
    exact = (flat[v0i * w + u0i] * (1 - dud) * (1 - dvd)
             + flat[v0i * w + u1i] * dud * (1 - dvd)
             + flat[v1i * w + u0i] * (1 - dud) * dvd
             + flat[v1i * w + u1i] * dud * dvd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)
