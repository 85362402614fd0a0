"""Unit tests for the BRDF core (new design; reference ships no tests —

SURVEY.md §4). Checks closed forms, pdf normalization by MC, sampler
consistency, and differentiability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.ops import brdf


def _rand_dirs(key, n, hemisphere_normal=None):
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    if hemisphere_normal is not None:
        flip = jnp.sum(d * hemisphere_normal, axis=-1, keepdims=True) < 0
        d = jnp.where(flip, -d, d)
    return d


def test_frame_orthonormal():
    key = jax.random.PRNGKey(0)
    n = _rand_dirs(key, 256)
    t, b, nn = brdf.build_frame(n)
    for a, c in [(t, b), (t, nn), (b, nn)]:
        np.testing.assert_allclose(np.abs(brdf.dot(a, c)[..., 0]), 0, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(t, axis=-1), 1, atol=1e-5)
    # right-handed: t × b = n
    np.testing.assert_allclose(jnp.cross(t, b), nn, atol=1e-5)


def test_d_ggx_normalization():
    """∫ D(h) NoH dω = 1 over the hemisphere (MC, loose tolerance)."""
    key = jax.random.PRNGKey(1)
    n = jnp.array([0.0, 0.0, 1.0])
    for r in [0.3, 0.6, 1.0]:
        d = _rand_dirs(key, 200_000, n)  # uniform hemisphere, pdf = 1/(2π)
        no_h = jnp.maximum(d[:, 2:3], 0.0)
        vals = brdf.d_ggx(no_h, jnp.full_like(no_h, r)) * no_h * 2 * np.pi
        assert abs(float(vals.mean()) - 1.0) < 0.05, r


def test_pdf_integrates_to_one():
    """The 50/50 mixture pdf integrates to ~1 over the sphere."""
    key = jax.random.PRNGKey(2)
    normal = jnp.array([0.0, 0.0, 1.0])
    wo = brdf.normalize(jnp.array([0.4, 0.1, 0.9]))
    d = _rand_dirs(key, 400_000)  # uniform sphere, pdf = 1/(4π)
    alb = jnp.ones((1, 3)) * 0.5
    rough = jnp.full((1, 1), 0.5)
    metal = jnp.full((1, 1), 0.3)
    _, pdf = brdf.eval_brdf(d, wo, normal, alb, rough, metal)
    est = float(pdf[..., 0].mean() * 4 * np.pi)
    assert abs(est - 1.0) < 0.05


def test_sampler_matches_pdf():
    """Histogram check: E[f(wi)] via sampler == ∫ f·pdf via uniform MC."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    n_samp = 200_000
    normal = jnp.array([0.0, 0.0, 1.0])
    wo = brdf.normalize(jnp.array([0.3, -0.2, 0.9]))
    rough = jnp.full((n_samp, 1), 0.4)
    alb = jnp.full((n_samp, 3), 0.6)
    metal = jnp.full((n_samp, 1), 0.2)
    u1 = jax.random.uniform(k1, (n_samp,))
    u2 = jax.random.uniform(k2, (n_samp, 2))
    wi, pdf, _ = brdf.sample_brdf(u1, u2, wo, normal, alb, rough, metal)
    # test function f = max(wi·a, 0) for a fixed direction a
    a = brdf.normalize(jnp.array([0.5, 0.5, 0.7]))
    f = jnp.maximum(jnp.sum(wi * a, axis=-1), 0.0)
    est_sampler = float(f.mean())

    d = _rand_dirs(k3, 400_000)
    _, pdf_u = brdf.eval_brdf(d, wo, normal, alb[:1], rough[:1], metal[:1])
    f_u = jnp.maximum(jnp.sum(d * a, axis=-1), 0.0)
    est_ref = float((f_u * pdf_u[..., 0]).mean() * 4 * np.pi)
    assert abs(est_sampler - est_ref) < 0.05 * max(abs(est_ref), 1e-3)


def test_white_furnace_energy():
    """Lambertian-ish furnace: albedo 1, metal 0 ⇒ reflected ≲ 1.

    The Disney retro term can slightly exceed 1 at grazing; just assert a
    sane bound and positivity."""
    key = jax.random.PRNGKey(4)
    n_samp = 200_000
    normal = jnp.array([0.0, 0.0, 1.0])
    wo = brdf.normalize(jnp.array([0.0, 0.0, 1.0]))
    u1 = jax.random.uniform(key, (n_samp,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (n_samp, 2))
    alb = jnp.ones((n_samp, 3))
    rough = jnp.full((n_samp, 1), 0.8)
    metal = jnp.zeros((n_samp, 1))
    _, _, w = brdf.sample_brdf(u1, u2, wo, normal, alb, rough, metal)
    total = float(w.mean())
    assert 0.5 < total < 1.6


def test_grad_flows_through_brdf_not_pdf():
    key = jax.random.PRNGKey(5)
    normal = jnp.array([0.0, 0.0, 1.0])
    wo = brdf.normalize(jnp.array([0.2, 0.1, 0.95]))
    u1 = jax.random.uniform(key, (64,))
    u2 = jax.random.uniform(jax.random.fold_in(key, 1), (64, 2))

    def loss(rough_scalar):
        rough = jnp.full((64, 1), rough_scalar)
        alb = jnp.full((64, 3), 0.5)
        metal = jnp.full((64, 1), 0.5)
        _, _, w = brdf.sample_brdf(u1, u2, wo, normal, alb, rough, metal)
        return w.mean()

    g = jax.grad(loss)(0.4)
    assert np.isfinite(float(g)) and abs(float(g)) > 0

    # The detached-pdf estimator is *intentionally* different from the true
    # derivative of the sample mean (pdf under stop_gradient), so FD-check
    # eval_brdf instead, where no stop_gradient exists.
    wi = brdf.normalize(jnp.array([0.1, 0.3, 0.94]))

    def loss_eval(r):
        f, _ = brdf.eval_brdf(
            wi, wo, normal, jnp.full((3,), 0.5), jnp.full((1,), r),
            jnp.full((1,), 0.5))
        return f.sum()

    eps = 1e-3
    fd = (float(loss_eval(0.45 + eps)) - float(loss_eval(0.45 - eps))) / (2 * eps)
    ad = float(jax.grad(loss_eval)(0.45))
    assert abs(fd - ad) < 1e-2 * max(abs(fd), 1.0), (fd, ad)


def test_eval_brdf_batched_shapes():
    s, h, w = 2, 4, 4
    wi = jnp.ones((s, h, w, 3)) / np.sqrt(3)
    wo = jnp.ones((s, h, w, 3)) / np.sqrt(3)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (s, h, w, 3))
    alb = jnp.full((h, w, 3), 0.5)
    rough = jnp.full((h, w, 1), 0.5)
    metal = jnp.full((h, w, 1), 0.5)
    f, pdf = brdf.eval_brdf(wi, wo, n, alb, rough, metal)
    assert f.shape == (s, h, w, 3) and pdf.shape == (s, h, w, 1)
