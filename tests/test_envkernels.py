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
