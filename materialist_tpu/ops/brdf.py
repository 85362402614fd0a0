"""Microfacet BRDF math — the shading core of the framework.

Re-implements, in pure jnp over batched arrays, the estimator semantics of
the reference's production Dr.Jit plugin ``MatDiffBSDF``
(myutils/mi_plugin.py:1229-1475):

* GGX normal distribution with the reference's epsilon placement
  (mi_plugin.py:89-97);
* Schlick-GGX Smith shadowing *pre-divided* by NoV*NoL (mi_plugin.py:60-76);
* Disney retro-reflective diffuse + GGX "metal" lobe, NoL folded into the
  returned value (mi_plugin.py:1403-1415);
* 50/50 diffuse/specular lobe selection with the mixed pdf
  0.5*D*NoH/(4 VoH) + 0.5*NoL/π (mi_plugin.py:1329-1332,1397-1401);
* pdf is detached from the gradient tape (the torch path's ``D.data``,
  mi_plugin.py:366) via ``lax.stop_gradient`` at the sampling weight.

All functions take/return arrays with a trailing feature axis and broadcast
over any leading batch shape — (S, H, W) on TPU so XLA can fuse the whole
shade into a few VPU loops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def dot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def normalize(v, eps: float = 1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def build_frame(n):
    """Orthonormal tangent frame (t, b, n) from normals (..., 3).

    Role of the reference's ``get_normal_space`` (mi_plugin.py:26-44) /
    ``mi.Frame3f``; uses the branchless Duff et al. basis, which is
    equivalent for isotropic lobes and jit-friendly (no boolean indexing).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt, n


def to_world(local, n):
    """Local (tangent-space) direction (..., 3) → world, given normals."""
    t, b, nn = build_frame(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * nn
    )


def d_ggx(no_h, roughness):
    """GGX NDF, α = roughness² (mi_plugin.py:89-97 epsilon placement)."""
    alpha = roughness * roughness
    alpha2 = alpha * alpha
    denom = no_h * no_h * (alpha2 - 1.0) + 1.0 + 1e-6
    return alpha2 / (PI * denom * denom)


def g1_ggx_schlick(no_x, roughness):
    """Schlick-GGX G1 divided by NoX, k = (r+1)²/8 (mi_plugin.py:60-68)."""
    k = (roughness + 1.0) ** 2 / 8.0
    return 1.0 / (no_x * (1.0 - k) + k + 1e-6)


def g_smith(no_v, no_l, roughness):
    """Smith shadowing / (NoV*NoL) (mi_plugin.py:70-76)."""
    return g1_ggx_schlick(no_l, roughness) * g1_ggx_schlick(no_v, roughness)


def fresnel_schlick(vo_h, f0):
    x = (1.0 - vo_h) ** 5
    return f0 + (1.0 - f0) * x


def eval_brdf(wi, wo, normal, albedo, roughness, metallic):
    """Disney-diffuse + GGX-metal BRDF and the 50/50 mixture pdf.

    Args:
        wi: (..., 3) sampled/light direction (world).
        wo: (..., 3) view direction (world, points away from surface).
        normal: (..., 3).
        albedo: (..., 3); roughness, metallic: (..., 1).
    Returns:
        brdf: (..., 3) — f * NoL (cosine folded in, as mi_plugin.py:1409,1414).
        pdf:  (..., 1) — 0.5*pdf_spec + 0.5*pdf_diff (mi_plugin.py:1397-1401).
    """
    h = normalize(wi + wo)
    no_l = jnp.maximum(dot(normal, wi), 0.0)
    no_v = jnp.maximum(dot(normal, wo), 0.0)
    vo_h = jnp.maximum(dot(wo, h), 0.0)
    no_h = jnp.maximum(dot(normal, h), 0.0)

    d = d_ggx(no_h, roughness)
    pdf_spec = d / (4.0 * jnp.maximum(vo_h, 1e-6)) * no_h
    pdf_diff = no_l / PI
    pdf = 0.5 * pdf_spec + 0.5 * pdf_diff

    base_d = albedo * (1.0 - metallic)
    f_d90 = 0.5 + 2.0 * vo_h**2 * roughness
    f_out = 1.0 + (f_d90 - 1.0) * (1.0 - no_v) ** 5
    f_in = 1.0 + (f_d90 - 1.0) * (1.0 - no_l) ** 5
    brdf_diff = base_d / PI * f_out * f_in * no_l

    g = g_smith(no_v, no_l, roughness)
    c0 = (1.0 - metallic) * 0.04 + metallic * albedo
    f_m = c0 + (1.0 - c0) * (1.0 - vo_h) ** 5
    brdf_metal = d * g * f_m / 4.0 * no_l

    brdf = brdf_diff + brdf_metal
    return brdf, pdf


def sample_diffuse(u2, normal):
    """Cosine-hemisphere sample; u2 (..., 2) → wi (..., 3) world.

    θ = asin(√u₀) ⇒ p(ω) = cosθ/π (mi_plugin.py:255-281 semantics).
    """
    sin_t = jnp.sqrt(jnp.clip(u2[..., 0], 0.0, 1.0))
    cos_t = jnp.sqrt(jnp.clip(1.0 - u2[..., 0], 0.0, 1.0))
    phi = 2.0 * PI * u2[..., 1]
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    return to_world(local, normal)


def sample_ggx(u2, roughness, wo, normal):
    """GGX NDF half-vector sample reflected about wo (mi_plugin.py:217-253).

    cos²θ_h = (1-u₀)/(u₀(α²-1)+1). NaN-scrubbed like the Dr.Jit original.
    """
    alpha = (roughness * roughness)[..., 0]
    a2 = alpha * alpha
    cos_t = jnp.sqrt(
        jnp.clip((1.0 - u2[..., 0]) / (u2[..., 0] * (a2 - 1.0) + 1.0), 0.0, 1.0)
    )
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    phi = 2.0 * PI * u2[..., 1]
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1
    )
    wh = to_world(local, normal)
    wi = 2.0 * dot(wo, wh) * wh - wo
    wi = jnp.nan_to_num(wi)
    return normalize(wi)


def sample_dirs(u1, u2, wo, normal, roughness):
    """50/50 lobe-mixture sampled direction only (no BSDF values) — the
    decision half of sample_brdf, used by the non-differentiable trace
    pass of the path-replay estimator."""
    wi_d = sample_diffuse(u2, normal)
    wi_s = sample_ggx(u2, roughness, wo, normal)
    return jnp.where((u1 > 0.5)[..., None], wi_d, wi_s)


def sample_brdf(u1, u2, wo, normal, albedo, roughness, metallic):
    """50/50 lobe-mixture BRDF sampling (mi_plugin.py:1296-1341).

    Returns (wi, pdf, weight) with weight = brdf/(pdf+1e-6), pdf detached
    (stop_gradient) so gradients flow through the BRDF numerator only —
    the detached-sampling estimator the reference uses (mi_plugin.py:366).
    """
    wi = sample_dirs(u1, u2, wo, normal, roughness)
    brdf, pdf = eval_brdf(wi, wo, normal, albedo, roughness, metallic)
    pdf_det = jax.lax.stop_gradient(pdf)
    weight = brdf / (pdf_det + 1e-6)
    weight = jnp.where(pdf_det > 1e-6, weight, 0.0)
    weight = jnp.nan_to_num(weight, nan=0.0, posinf=0.0, neginf=0.0)
    return wi, pdf_det, weight
