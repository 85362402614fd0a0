"""Sharded render / train steps via shard_map over a jax.sharding.Mesh.

Two shardings, composable on a 2-D ("px", "spp") mesh:

* sample ("spp") sharding — each chip traces spp/D samples with a folded
  key and the per-pixel radiance is psum-mean'd over ICI. Gradients of the
  replicated materials/envmap are explicitly pmean'd before the optimizer
  update (each shard's grad only carries its local samples' contribution).
* pixel-row ("px") sharding — the per-pixel ray state (G-buffer rows,
  output tile) is split across chips while the *depth map* and materials
  stay replicated, because secondary rays march anywhere in the film.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from materialist_tpu.camera import Camera
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.render.scene import GBuffer, Materials
from materialist_tpu.render.shader import RenderConfig, render_with_bsdf


def spp_sharded_render(mesh: Mesh, cfg: RenderConfig, cam: Camera,
                       axis: str = "spp") -> Callable:
    """Returns render(key, gbuf, mats, envmap) sharded over samples."""
    n_dev = mesh.shape[axis]
    local_cfg = cfg._replace(spp=max(cfg.spp // n_dev, 1),
                             chunk=min(cfg.chunk,
                                       max(cfg.spp // n_dev, 1)))

    def local_render(key, gbuf, mats, envmap):
        i = jax.lax.axis_index(axis)
        img = render_with_bsdf(jax.random.fold_in(key, i), local_cfg, cam,
                               gbuf, mats, envmap)
        return jax.lax.pmean(img, axis)

    return jax.jit(shard_map(local_render, mesh=mesh,
                             in_specs=(P(), P(), P(), P()),
                             out_specs=P(), check_vma=False))


def px_sharded_render(mesh: Mesh, cfg: RenderConfig, cam: Camera,
                      axis: str = "px") -> Callable:
    """Returns render(key, gbuf, mats, envmap) with the film's rows split
    across chips; the full dist/valid maps ride along replicated for the
    screen-space marcher."""

    def local_render(key, gbuf_rows, dist_full, valid_full, mats, envmap):
        i = jax.lax.axis_index(axis)
        n_chunks = max(cfg.spp // cfg.chunk, 1)
        keys = jax.random.split(jax.random.fold_in(key, i), n_chunks)

        def body(k):
            return _trace_chunk_rows(k, cfg, cam, gbuf_rows, dist_full,
                                     valid_full, mats, envmap)

        acc = body(keys[0])
        for k in keys[1:]:
            acc = acc + body(k)
        return acc / n_chunks

    return jax.jit(shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), GBuffer(P(axis), P(axis), P(axis), P(axis), P(axis)),
                  P(), P(), P(), P()),
        out_specs=P(axis), check_vma=False))


def _trace_chunk_rows(key, cfg, cam, local_gbuf, dist_full, valid_full,
                      mats, envmap):
    """Row-block tracing against the full heightfield (helper for
    px_sharded_render). Mirrors shader._trace_chunk with decoupled
    ray-state/march-target geometry."""
    from materialist_tpu.ops import brdf as B, envmap as em
    from materialist_tpu.render import bsdf as bsdf_mod
    from materialist_tpu.render import screenspace as ss

    h_loc, w = local_gbuf.dist.shape
    n_loc = h_loc * w
    n_full = dist_full.shape[0] * dist_full.shape[1]
    s = cfg.chunk
    sg = jax.lax.stop_gradient

    _bsdf = bsdf_mod.disney(mats)
    gather_fn, eval_fn, sample_fn = _bsdf.gather, _bsdf.eval, _bsdf.sample
    env_sampler = em.build_sampler(envmap)
    n_flat = mats.normal.reshape(n_full, 3)
    pos_local = local_gbuf.position.reshape(n_loc, 3)

    # full-film tables for secondary vertices
    # (positions can be recomputed from dist_full via the camera)
    dist_flat = dist_full.reshape(-1)
    pix = jnp.arange(n_full, dtype=jnp.int32)
    uu = (pix % w).astype(jnp.float32)
    vv = (pix // w).astype(jnp.float32)
    x = (uu + 0.5 - cam.cx) / cam.focal
    y = -(vv + 0.5 - cam.cy) / cam.focal
    dirs = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    pos_full = dirs * dist_flat[:, None]
    if cfg.use_mesh_normal:
        from materialist_tpu.camera import normals_from_depth
        geo_full = normals_from_depth(
            pos_full.reshape(dist_full.shape[0], w, 3)).reshape(n_full, 3)
        n_flat = geo_full

    # ray state starts at the local rows; indices are FULL-film flat ids
    row0 = jax.lax.axis_index("px") * h_loc
    base = (jnp.arange(n_loc, dtype=jnp.int32) + row0 * w)
    idx = jnp.broadcast_to(base, (s, n_loc))
    pos = jnp.broadcast_to(pos_local, (s, n_loc, 3))
    wo = jnp.broadcast_to(local_gbuf.wo.reshape(n_loc, 3), (s, n_loc, 3))
    alive = jnp.broadcast_to(local_gbuf.valid.reshape(n_loc), (s, n_loc))
    throughput = jnp.ones((s, n_loc, 3), jnp.float32)
    radiance = jnp.zeros((s, n_loc, 3), jnp.float32)

    for b in range(cfg.max_depth - 1):
        kb = jax.random.fold_in(key, b)
        k_lobe, k_uv, k_nee = jax.random.split(kb, 3)
        nrm = n_flat[idx]
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1,
                                                keepdims=True), 1e-9)

        blob = gather_fn(idx)

        if cfg.nee:
            u_nee = jax.random.uniform(k_nee, (s, n_loc, 2))
            wi_e, pdf_e, le = em.sample(env_sampler, u_nee)
            wi_e, pdf_e = sg(wi_e), sg(pdf_e)
            f_e, pdf_b_at_e = eval_fn(blob, idx, wi_e, wo, nrm)
            w_mis = pdf_e / (pdf_e + sg(pdf_b_at_e) + 1e-9)
            shadowed = ss.occluded(cam, dist_full, valid_full, sg(pos),
                                   wi_e, n_steps=cfg.shadow_steps)
            gate = (alive & ~shadowed)[..., None]
            radiance = radiance + jnp.where(
                gate, throughput * f_e / (pdf_e + 1e-9) * w_mis * le, 0.0)

        u1 = jax.random.uniform(k_lobe, (s, n_loc))
        u2 = jax.random.uniform(k_uv, (s, n_loc, 2))
        wi, pdf_b, weight = sample_fn(blob, idx, u1, u2, wo, nrm)
        wi = sg(wi)
        hit = jax.tree.map(sg, ss.march(cam, dist_full, valid_full,
                                        sg(pos), wi,
                                        n_steps=cfg.march_steps))
        le_miss = em.lookup_bilinear(envmap, wi)
        pdf_e_at_wi = sg(em.pdf_dir(env_sampler, wi))
        w_mis_b = pdf_b / (pdf_b + pdf_e_at_wi + 1e-9)
        miss_gate = (alive & ~hit.hit)[..., None]
        radiance = radiance + jnp.where(
            miss_gate, throughput * weight * w_mis_b * le_miss, 0.0)

        throughput = throughput * weight
        alive = alive & hit.hit
        idx = hit.idx
        pos = pos_full[idx]
        wo = -wi

    img = jnp.mean(radiance, axis=0).reshape(h_loc, w, 3)
    return jnp.nan_to_num(img)


def make_sharded_train_step(mesh: Mesh, cfg: RenderConfig, cam: Camera,
                            optimizer, axis: str = "spp") -> Callable:
    """Full inverse-opt step sharded over samples: render fwd+bwd with the
    envmap + materials as leaves, psum'd image, optax update. Returns
    step(params, opt_state, key, gbuf, gt_srgb) → (params, opt_state, loss).

    params = {"mats": Materials, "envmap": (16,32,3)}.
    """
    n_dev = mesh.shape[axis]
    local_cfg = cfg._replace(spp=max(cfg.spp // n_dev, 1),
                             chunk=min(cfg.chunk, max(cfg.spp // n_dev, 1)))

    def local_loss(params, key, gbuf, gt_srgb):
        i = jax.lax.axis_index(axis)
        img = render_with_bsdf(jax.random.fold_in(key, i), local_cfg, cam,
                               gbuf, params["mats"], params["envmap"])
        img = jax.lax.pmean(img, axis)
        pred = linear_to_srgb(img)
        mse = jnp.mean((pred - gt_srgb) ** 2)
        l1 = jnp.mean(jnp.abs(pred - gt_srgb))
        return mse + l1

    def local_step(params, opt_state, key, gbuf, gt_srgb):
        loss, grads = jax.value_and_grad(local_loss)(params, key, gbuf,
                                                     gt_srgb)
        # Each shard's grad carries only its local MC samples' contribution
        # (pmean's transpose replicates the cotangent; it does not sum the
        # per-shard pieces), so all-reduce explicitly before the update to
        # keep params/opt_state bitwise identical across chips.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    sharded = shard_map(local_step, mesh=mesh,
                        in_specs=(P(), P(), P(), P(), P()),
                        out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(sharded)
