"""Ablation profile of the shade pass (fwd + vjp) at north-star shapes.

The round-3 component profile (scripts/profile_northstar.py) shows the
shade vjp dominating the step (2364 ms of a ~13.3 s predicted step at
1024²×64spp). This script attributes that cost by re-timing shade with
components stubbed out one at a time, against FIXED records from one
real trace:

    full          — production shade
    no-nee        — cfg.nee=False (drops NEE eval + its envmap lookup)
    env-const     — em.lookup_bilinear -> ones (drops one-hot contractions)
    bsdf-const    — bsdf.eval -> constants (drops BRDF math)
    mats-detached — stop_gradient(mats): only the envmap adjoint remains
    env-detached  — stop_gradient(envmap): only the material adjoint

Usage: python scripts/profile_shade.py [RES] [SPP]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr
from materialist_tpu.opt.plan import plan_step
from materialist_tpu.render import bsdf as bsdf_mod
from materialist_tpu.render import shader
from materialist_tpu.render.scene import Materials, load_best_results, \
    make_gbuffer
from materialist_tpu.render.shader import (RenderConfig,
                                           shade_from_records,
                                           trace_step_records)

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16

base = "/root/reference/output_imgs/indoor"
mat = load_best_results(f"{base}/best_results", roughness_remap=False)


def rs(x):
    x = jnp.asarray(x)
    if x.ndim == 2:
        x = x[..., None]
    if x.shape[0] != RES:
        x = jax.image.resize(x, (RES, RES, x.shape[-1]), "bilinear")
    return x


depth = rs(exr.read(f"{base}/depthPred.exr")[..., :1])
cam = Camera(RES, RES)
gbuf = make_gbuffer(depth[..., 0], cam, flip_depth=True)
mats = Materials(rs(mat["albedo"]), rs(mat["roughness"]),
                 rs(mat["metallic"]), rs(mat["normal"]))
envmap = jnp.asarray(mat["envmap"])

plan = plan_step(RES, max(SPP, 64))
cfg = RenderConfig(spp=SPP, chunk=min(plan.chunk, SPP),
                   replay_blob=plan.replay_blob)
print(f"== RES={RES} SPP={SPP} chunk={cfg.chunk} replay={plan.replay_blob}",
      flush=True)

params = {"mats": mats, "envmap": envmap}
key = jax.random.PRNGKey(0)
records = jax.jit(lambda p, k: trace_step_records(
    k, cfg, cam, gbuf, p["mats"], p["envmap"]))(params, key)
jax.block_until_ready(jax.tree.leaves(records)[0])


def fetch(x):
    s = 0.0
    for l in jax.tree.leaves(x)[:2]:
        s += float(jnp.ravel(l)[0].astype(jnp.float32))
    return s


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:44s} {dt:9.1f} ms", flush=True)
    return dt


def run_variant(name, cfg_v, env_stub=False, bsdf_stub=False,
                detach_mats=False, detach_env=False):
    orig_lookup = shader.em.lookup_bilinear
    orig_disney = bsdf_mod.disney
    try:
        if env_stub:
            shader.em.lookup_bilinear = \
                lambda e, d: jnp.ones(d.shape[:-1] + (3,), jnp.float32) \
                + 0.0 * e[0, 0].sum()
        if bsdf_stub:
            def stub_disney(m):
                b = orig_disney(m)
                def eval_fn(blob, idx, wi, wo, nrm):
                    s = blob[..., :3].sum(-1, keepdims=True)
                    return (jnp.broadcast_to(0.1 + 0.0 * s,
                                             wi.shape[:-1] + (3,)),
                            jnp.broadcast_to(0.5 + 0.0 * s,
                                             wi.shape[:-1] + (1,)))
                return b._replace(eval=eval_fn)
            bsdf_mod.disney = stub_disney

        def fwd(p, r, k):
            m, e = p["mats"], p["envmap"]
            if detach_mats:
                m = jax.tree.map(jax.lax.stop_gradient, m)
            if detach_env:
                e = jax.lax.stop_gradient(e)
            return shade_from_records(k, r, cfg_v, cam, gbuf, m, e)

        fwd_j = jax.jit(fwd)

        def loss(p, r, k):
            return jnp.mean(fwd(p, r, k))

        vjp_j = jax.jit(jax.grad(loss))
        t_f = timeit(f"{name} fwd", fwd_j, params, records, key)
        t_b = timeit(f"{name} grad(fwd+bwd)", vjp_j, params, records, key)
        return t_f, t_b
    finally:
        shader.em.lookup_bilinear = orig_lookup
        bsdf_mod.disney = orig_disney


run_variant("full", cfg)
run_variant("no-nee", cfg._replace(nee=False))
run_variant("env-const", cfg, env_stub=True)
run_variant("bsdf-const", cfg, bsdf_stub=True)
run_variant("env+bsdf-const", cfg, env_stub=True, bsdf_stub=True)
run_variant("mats-detached", cfg, detach_mats=True)
run_variant("env-detached", cfg, detach_env=True)
