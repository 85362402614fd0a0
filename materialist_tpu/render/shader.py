"""Differentiable Monte-Carlo G-buffer path tracer.

The TPU-native replacement for Mitsuba's `path` integrator + MatDiffBSDF +
envmap emitter + Dr.Jit AD (reference call stack SURVEY.md §3.2):

* primary visibility = the pixel grid (camera fixed, geometry = depth map);
* per-vertex BSDF = Disney-diffuse + GGX-metal with 50/50 lobe sampling
  (ops/brdf.py, matching mi_plugin.py:1296-1427 semantics);
* direct light = balance-heuristic MIS between BSDF samples and envmap
  CDF importance samples (NEE), like Mitsuba's path integrator;
* ≥2nd bounces = screen-space marching (render/screenspace.py), envmap on
  miss; max_depth=4 ⇒ 3 statically-unrolled scattering events;
* the sample (spp) axis is scanned in chunks with jax.checkpoint so the
  backward pass re-materializes one chunk at a time — the whole
  render-forward + adjoint fits in HBM at 512²×64spp and beyond.

Gradient semantics: sampling decisions, pdfs, MIS weights and all geometry
queries are stop_gradient'ed (detached-sampling estimator; the reference
detaches the NDF inside its pdf, mi_plugin.py:366, and Mitsuba's attached
quantities are likewise the BSDF values and emitter radiance only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.ops import brdf, envmap as em
from materialist_tpu.render.scene import GBuffer, Materials
from materialist_tpu.render import screenspace as ss


class RenderConfig(NamedTuple):
    """Static render parameters (hashable ⇒ usable as a jit static arg)."""
    spp: int = 64
    chunk: int = 8           # samples per scanned chunk
    max_depth: int = 4       # path segments, Mitsuba convention
    use_mesh_normal: bool = True
    march_steps: int = 24
    shadow_steps: int = 16
    nee: bool = True          # envmap NEE + MIS (Mitsuba path behavior)
    sky_background: bool = True  # invalid pixels show the envmap
    march_impl: str = "fused"  # "fused": whole-march Pallas kernel (vreg
    #                            gathers, production path; exact-equal CPU
    #                            fallback); "mip": per-step MXU-gather
    #                            lookups; "exact": full-res per-step tests
    mip_factor: int = 4
    fine_steps: int = 6       # fine substeps within the candidate interval
    shadow_fine_steps: int = 2
    fine_factor: int = 2      # fine-pass surface table resolution divisor
    film_jitter: float = 0.0  # σ (pixels) of primary-sample jitter — the
    # analog of Mitsuba's in-pixel sampling + Gaussian film filter; the
    # jittered sample still accumulates into its own pixel
    march_vectorized: bool = False  # exact impl only: step-parallel march
    # (fast CPU compile, large intermediates) vs statically unrolled (TPU)


def _trace_chunk(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                 mats: Materials, envmap, bsdf=None):
    """Trace cfg.chunk samples for every pixel. Returns (H, W, 3) mean.

    ``bsdf``: optional (eval_fn, sample_fn) pair from render/bsdf.py;
    defaults to the Disney material BSDF built from ``mats``.
    """
    h, w = gbuf.dist.shape
    n = h * w
    s = cfg.chunk

    if bsdf is None:
        from materialist_tpu.render import bsdf as bsdf_mod
        bsdf = bsdf_mod.disney(mats)
    gather_fn, eval_fn, sample_fn = bsdf

    env_sampler = em.build_sampler(envmap)
    # packed (stop-grad) geometry table: one row-gather per bounce
    # fetches position + geometric normal together
    geo_table = jnp.concatenate(
        [gbuf.position.reshape(n, 3), gbuf.normal_geo.reshape(n, 3)],
        axis=-1)

    sg = jax.lax.stop_gradient

    # path state, (s, n, ...)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (s, n))
    if cfg.film_jitter > 0.0:
        kj = jax.random.fold_in(key, 991)
        off = jax.random.normal(kj, (s, n, 2)) * cfg.film_jitter
        du = jnp.round(off[..., 0]).astype(jnp.int32)
        dv = jnp.round(off[..., 1]).astype(jnp.int32)
        uu = jnp.clip(idx % w + du, 0, w - 1)
        vv = jnp.clip(idx // w + dv, 0, h - 1)
        idx = vv * w + uu
    wo = jnp.broadcast_to(gbuf.wo.reshape(n, 3), (s, n, 3))
    alive = jnp.broadcast_to(gbuf.valid.reshape(n), (s, n))
    throughput = jnp.ones((s, n, 3), jnp.float32)
    radiance = jnp.zeros((s, n, 3), jnp.float32)

    if cfg.sky_background:
        view_dir = -gbuf.wo.reshape(n, 3)
        sky = em.lookup_bilinear(envmap, view_dir)
        radiance = radiance + jnp.where(
            gbuf.valid.reshape(1, n, 1), 0.0, sky[None])

    dist_map = sg(gbuf.dist)
    valid_map = gbuf.valid

    if cfg.march_impl == "fused":
        from materialist_tpu.ops.pallas.march_kernel import march_fused

        def do_march(pos_, wi_):
            return march_fused(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.march_steps,
                               fine_steps=cfg.fine_steps)

        def do_occlude(pos_, wi_):
            return march_fused(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.shadow_steps,
                               fine_steps=max(cfg.shadow_fine_steps, 1),
                               shadow_only=cfg.shadow_fine_steps == 0).hit
    elif cfg.march_impl == "mip":
        mip = ss.build_min_mip(dist_map, valid_map, cfg.mip_factor)
        fine_table = ss.build_fine_table(dist_map, valid_map,
                                         cfg.fine_factor)

        def do_march(pos_, wi_):
            return ss.march_mip(cam, dist_map, valid_map, mip, pos_, wi_,
                                n_steps=cfg.march_steps,
                                fine_steps=cfg.fine_steps,
                                mip_factor=cfg.mip_factor,
                                fine_table=fine_table,
                                fine_factor=cfg.fine_factor)

        def do_occlude(pos_, wi_):
            return ss.march_mip(cam, dist_map, valid_map, mip, pos_, wi_,
                                n_steps=cfg.shadow_steps,
                                fine_steps=cfg.shadow_fine_steps,
                                mip_factor=cfg.mip_factor,
                                shadow_only=cfg.shadow_fine_steps == 0,
                                fine_table=fine_table,
                                fine_factor=cfg.fine_factor).hit
    else:
        def do_march(pos_, wi_):
            return ss.march(cam, dist_map, valid_map, pos_, wi_,
                            n_steps=cfg.march_steps,
                            vectorized=cfg.march_vectorized)

        def do_occlude(pos_, wi_):
            return ss.occluded(cam, dist_map, valid_map, pos_, wi_,
                               n_steps=cfg.shadow_steps,
                               vectorized=cfg.march_vectorized)

    for b in range(cfg.max_depth - 1):
        kb = jax.random.fold_in(key, b)
        k_lobe, k_uv, k_nee = jax.random.split(kb, 3)

        blob = gather_fn(idx)          # one differentiable row-gather
        geo = sg(geo_table[idx])       # one geometry row-gather (no grad)
        pos = geo[..., 0:3]
        if cfg.use_mesh_normal:
            nrm = geo[..., 3:6]
        else:
            nm = blob[..., 5:8]
            nrm = nm / jnp.maximum(
                jnp.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)

        # ---- NEE: envmap importance sample + shadow march + MIS
        if cfg.nee:
            u_nee = jax.random.uniform(k_nee, (s, n, 2))
            wi_e, pdf_e, le = em.sample(env_sampler, u_nee)
            wi_e, pdf_e = sg(wi_e), sg(pdf_e)
            f_e, pdf_b_at_e = eval_fn(blob, idx, wi_e, wo, nrm)
            w_mis = pdf_e / (pdf_e + sg(pdf_b_at_e) + 1e-9)
            shadowed = do_occlude(sg(pos), wi_e)
            contrib = throughput * f_e / (pdf_e + 1e-9) * w_mis * le
            gate = (alive & ~shadowed)[..., None]
            radiance = radiance + jnp.where(gate, contrib, 0.0)

        # ---- BSDF sampling: continue the path / hit the envmap
        u1 = jax.random.uniform(k_lobe, (s, n, 1))
        u2 = jax.random.uniform(k_uv, (s, n, 2))
        wi, pdf_b, weight = sample_fn(blob, idx, u1[..., 0], u2, wo, nrm)
        wi = sg(wi)
        hit = jax.tree.map(sg, do_march(sg(pos), wi))

        le_miss = em.lookup_bilinear(envmap, wi)
        if cfg.nee:
            pdf_e_at_wi = sg(em.pdf_dir(env_sampler, wi))
            w_mis_b = pdf_b / (pdf_b + pdf_e_at_wi + 1e-9)
        else:
            w_mis_b = 1.0
        miss_gate = (alive & ~hit.hit)[..., None]
        radiance = radiance + jnp.where(
            miss_gate, throughput * weight * w_mis_b * le_miss, 0.0)

        # advance the path (snap to the hit pixel's G-buffer position)
        throughput = throughput * weight
        alive = alive & hit.hit
        idx = hit.idx
        wo = -wi

    img = jnp.mean(radiance, axis=0)  # mean over the chunk's samples
    return jnp.nan_to_num(img, nan=0.0, posinf=0.0, neginf=0.0).reshape(
        h, w, 3)


def render_with_bsdf(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
                     mats: Materials, envmap, bsdf=None):
    """Render with an arbitrary BSDF closure pair (render/bsdf.py)."""
    n_chunks = max(cfg.spp // cfg.chunk, 1)
    keys = jax.random.split(key, n_chunks)

    body = jax.checkpoint(
        lambda k: _trace_chunk(k, cfg, cam, gbuf, mats, envmap, bsdf))

    # Unrolled accumulation: a lax.scan whose body contains gathers pays a
    # large per-iteration dispatch cost on TPU; checkpointing per chunk
    # still bounds backward memory to one chunk.
    h, w = gbuf.dist.shape
    total = jnp.zeros((h, w, 3), jnp.float32)
    for i in range(n_chunks):
        total = total + body(keys[i])
    return total / n_chunks


@functools.partial(jax.jit, static_argnames=("cfg", "cam"))
def render(key, cfg: RenderConfig, cam: Camera, gbuf: GBuffer,
           mats: Materials, envmap):
    """Render the scene: MC estimate with cfg.spp samples per pixel.

    Differentiable w.r.t. ``mats`` and ``envmap`` (the reference's
    Differentiable params, mi_plugin.py:1464-1469 + emitter.data).
    """
    return render_with_bsdf(key, cfg, cam, gbuf, mats, envmap)
