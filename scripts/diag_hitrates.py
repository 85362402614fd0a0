"""Measure per-bounce alive/hit/shadow rates of the production trace on a
fixture — sizing data for trace-side path compaction (round-4 perf work).

A path is 'alive at bounce b' if every preceding lobe march hit. Dead rays
still occupy lanes in every downstream op (marches, gathers, scatters,
shade); the alive fractions bound the win from compacting them away.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/diag_hitrates.py [RES] [SPP]
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr, image as image_io
from materialist_tpu.render.scene import Materials, load_best_results, \
    make_gbuffer
from materialist_tpu.render.shader import RenderConfig, trace_step_records

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
SCENES = sys.argv[3].split(",") if len(sys.argv) > 3 else ["indoor",
                                                           "jinjya"]

for scene in SCENES:
    base = f"/root/reference/output_imgs/{scene}"
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
    mask = None
    import os
    if os.path.exists(f"{base}/mesh_mask.png"):
        m = image_io.read(f"{base}/mesh_mask.png")
        mask = jnp.asarray((m[..., 0] if m.ndim == 3 else m) > 0.5)
        if mask.shape[0] != RES:
            mask = jax.image.resize(mask.astype(jnp.float32),
                                    (RES, RES), "nearest") > 0.5
    gbuf = make_gbuffer(depth[..., 0], cam, flip_depth=True, mask=mask)
    mats = Materials(rs(mat["albedo"]), rs(mat["roughness"]),
                     rs(mat["metallic"]), rs(mat["normal"]))
    envmap = jnp.asarray(mat["envmap"])

    cfg = RenderConfig(spp=SPP, chunk=8, film_jitter=0.5)
    recs = jax.jit(lambda k: trace_step_records(
        k, cfg, cam, gbuf, mats, envmap))(jax.random.PRNGKey(0))

    print(f"== {scene} {RES}^2 x {SPP}spp ==", flush=True)
    n_chunks = len(recs)
    for b in range(cfg.max_depth - 1):
        sh = jnp.mean(jnp.stack(
            [recs[c][b][0].astype(jnp.float32) for c in range(n_chunks)]))
        hit = jnp.mean(jnp.stack(
            [recs[c][b][1].astype(jnp.float32) for c in range(n_chunks)]))
        # alive at b = product of hits of bounces < b (per ray)
        alive = jnp.ones_like(recs[0][0][1], jnp.float32)
        al = []
        for c in range(n_chunks):
            a = jnp.ones_like(recs[c][0][1], jnp.float32)
            for bb in range(b):
                a = a * recs[c][bb][1].astype(jnp.float32)
            al.append(jnp.mean(a))
        alive_f = float(jnp.mean(jnp.stack(al)))
        print(f"  bounce {b}: alive={alive_f:.3f} "
              f"hit(march)={float(hit):.3f} shadowed={float(sh):.3f}",
              flush=True)
