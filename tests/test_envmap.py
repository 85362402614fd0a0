"""Envmap sampler tests: uv round-trips, CDF sampling vs analytic integrals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.ops import envmap as em


def test_uv_dir_roundtrip():
    h, w = 16, 32
    u = jnp.linspace(0.5, w - 0.5, 64)
    v = jnp.linspace(0.5, h - 0.5, 64)
    d = em.uv_to_dir(u, v, h, w)
    u2, v2 = em.dir_to_uv(d, h, w)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-3)


def test_lookup_bilinear_constant():
    env = jnp.ones((16, 32, 3)) * 2.5
    d = jax.random.normal(jax.random.PRNGKey(0), (100, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # the one-hot contraction runs in bf16 (the (…, W) one-hots are the
    # biggest HBM buffers of the inverse step): ~2^-9 relative tolerance
    np.testing.assert_allclose(np.asarray(em.lookup_bilinear(env, d)), 2.5,
                               rtol=4e-3)


def test_sample_pdf_consistency():
    """pdf_dir at sampled directions equals the pdf returned by sample."""
    key = jax.random.PRNGKey(1)
    env = jax.random.uniform(key, (16, 32, 3)) + 0.05
    sampler = em.build_sampler(env)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (4096, 2))
    wi, pdf, _ = em.sample(sampler, u2)
    pdf2 = em.pdf_dir(sampler, wi)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=0.3)


@pytest.mark.slow
def test_sampler_estimates_integral():
    """MC estimate of ∫ L dω with the importance sampler ≈ direct sum."""
    key = jax.random.PRNGKey(2)
    env = jax.random.uniform(key, (16, 32, 3)) * jnp.array([1.0, 2.0, 0.5]) + 0.1
    sampler = em.build_sampler(env)
    u2 = jax.random.uniform(jax.random.fold_in(key, 3), (400_000, 2))
    wi, pdf, rad = em.sample(sampler, u2)
    est = np.asarray((rad / pdf).mean(axis=0))

    # Direct quadrature of the equirect integral: dω = sinθ dθ dφ.
    h, w = 16, 32
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = np.sin(theta)[:, None] * (np.pi / h) * (2 * np.pi / w)
    ref = (np.asarray(env) * weights[..., None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.05)


@pytest.mark.slow
def test_pdf_dir_integrates_to_one():
    key = jax.random.PRNGKey(4)
    env = jax.random.uniform(key, (16, 32, 3)) + 0.2
    sampler = em.build_sampler(env)
    d = jax.random.normal(jax.random.fold_in(key, 1), (400_000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    est = float(em.pdf_dir(sampler, d).mean() * 4 * np.pi)
    assert abs(est - 1.0) < 0.05


def test_rotate_matches_numpy_roll():
    env = np.random.default_rng(0).random((16, 32, 3)).astype(np.float32)
    out = em.rotate(jnp.asarray(env), 90.0)
    ref = np.roll(env, 8, axis=1)
    np.testing.assert_allclose(np.asarray(out), ref)


def test_lookup_paths_agree(monkeypatch):
    """The gather (large-map) lookup path must match the one-hot path."""
    env = jax.random.uniform(jax.random.PRNGKey(7), (16, 32, 3))
    d = jax.random.normal(jax.random.PRNGKey(8), (500, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    small = em.lookup_bilinear(env, d)
    near_small = em.lookup_nearest(env, d)
    monkeypatch.setattr(em, "SMALL_ENV_AXIS", 1)  # force gather path
    large = em.lookup_bilinear(env, d)
    near_large = em.lookup_nearest(env, d)
    # small path is bf16 (see test_lookup_bilinear_constant), the gather
    # path f32 — they agree to bf16 precision
    np.testing.assert_allclose(np.asarray(small), np.asarray(large),
                               rtol=8e-3, atol=4e-3)
    np.testing.assert_allclose(np.asarray(near_small),
                               np.asarray(near_large), rtol=8e-3, atol=4e-3)


@pytest.mark.slow
def test_flat_sampler_estimates_integral():
    """Large-emitter flat-CDF sampler: MC ∫ L dω ≈ quadrature (the 512×1024
    relighting path, render_final.py:241-260)."""
    key = jax.random.PRNGKey(9)
    h, w = 128, 256
    env = jax.random.uniform(key, (h, w, 3)) * jnp.array([1.0, 2.0, 0.5]) \
        + 0.1
    sampler = em.build_sampler(env)
    assert isinstance(sampler, em.FlatEnvmapSampler)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (400_000, 2))
    wi, pdf, rad = em.sample(sampler, u2)
    est = np.asarray((rad / pdf).mean(axis=0))
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = np.sin(theta)[:, None] * (np.pi / h) * (2 * np.pi / w)
    ref = (np.asarray(env) * weights[..., None]).sum(axis=(0, 1))
    np.testing.assert_allclose(est, ref, rtol=0.05)


def test_flat_sampler_pdf_consistency():
    """pdf_dir ≈ sample's pdf except at texel boundaries, where the
    in-texel jitter can quantize into the neighboring row (the same edge
    exists in the reference sampler; harmless for MIS)."""
    key = jax.random.PRNGKey(10)
    env = jax.random.uniform(key, (128, 256, 3)) + 0.05
    sampler = em.build_sampler(env)
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (4096, 2))
    wi, pdf, _ = em.sample(sampler, u2)
    pdf2 = em.pdf_dir(sampler, wi)
    rel = np.abs(np.asarray(pdf) - np.asarray(pdf2)) / np.asarray(pdf)
    assert (rel > 0.3).mean() < 0.005


@pytest.mark.slow
def test_flat_pdf_dir_integrates_to_one():
    key = jax.random.PRNGKey(11)
    env = jax.random.uniform(key, (128, 256, 3)) + 0.2
    sampler = em.build_sampler(env)
    d = jax.random.normal(jax.random.fold_in(key, 1), (400_000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    est = float(em.pdf_dir(sampler, d).mean() * 4 * np.pi)
    assert abs(est - 1.0) < 0.05


def test_lookup_bilinear_gradient_matches_gather_path(monkeypatch):
    """The custom-VJP scatter backward must match the plain gather path's
    envmap gradient."""
    env = jax.random.uniform(jax.random.PRNGKey(20), (16, 32, 3)) + 0.1
    d = jax.random.normal(jax.random.PRNGKey(21), (400, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def loss(e):
        return jnp.sum(em.lookup_bilinear(e, d) ** 2)

    g1 = jax.grad(loss)(env)
    monkeypatch.setattr(em, "SMALL_ENV_AXIS", 1)  # force f32 gather path
    g2 = jax.grad(loss)(env)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-2, atol=2e-2)
