"""Round-3 fetch-forced component profile of the inverse step.

Every timing forces a host fetch of a scalar derived from the result
(block_until_ready does NOT block through this environment's device
tunnel). Components: fused march, shadow march, combo row-gather fwd,
scatter-add adjoint, envmap bilinear lookup fwd+bwd, envmap CDF sample,
trace pass, shade fwd, shade vjp, full step.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/profile_r3.py [RES] [SPP] [CHUNK]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import optax

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr
from materialist_tpu.ops import envmap as em
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.render.scene import Materials, load_best_results, \
    make_gbuffer
from materialist_tpu.render.shader import (RenderConfig, render,
                                           shade_from_records,
                                           trace_step_records)

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4

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
gt = rs(exr.read(f"{base}/gt_image.exr"))
cam = Camera(RES, RES)
gbuf = make_gbuffer(depth[..., 0], cam, flip_depth=True)
mats = Materials(rs(mat["albedo"]), rs(mat["roughness"]),
                 rs(mat["metallic"]), rs(mat["normal"]))
envmap = jnp.asarray(mat["envmap"])
gt_srgb = linear_to_srgb(gt)
n = RES * RES
key = jax.random.PRNGKey(0)


def fetch(x):
    leaves = jax.tree.leaves(x)
    s = 0.0
    for l in leaves[:4]:
        s += float(jnp.ravel(l)[0].astype(jnp.float32))
    return s


def timeit(name, fn, *args, reps=3):
    out = fn(*args)     # compile + warm
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:44s} {dt:9.1f} ms", flush=True)
    return dt


cfg = RenderConfig(spp=SPP, chunk=CHUNK, film_jitter=0.5)
print(f"== profile RES={RES} SPP={SPP} CHUNK={CHUNK} ==", flush=True)

# ---- march kernels (CHUNK rays/pixel)
from materialist_tpu.ops.pallas.march_kernel import march_fused

pos = jnp.broadcast_to(gbuf.position.reshape(n, 3), (CHUNK, n, 3))
wi = jax.random.normal(key, (CHUNK, n, 3))
wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
march_j = jax.jit(lambda p, d: march_fused(cam, gbuf.dist, gbuf.valid, p, d,
                                           n_steps=cfg.march_steps,
                                           fine_steps=cfg.fine_steps).idx)
shadow_j = jax.jit(lambda p, d: march_fused(
    cam, gbuf.dist, gbuf.valid, p, d, n_steps=cfg.shadow_steps,
    fine_steps=1, shadow_only=False).hit)
t_march = timeit(f"march {cfg.march_steps}+{cfg.fine_steps} "
                 f"({CHUNK}x{n//1000}k rays)", march_j, pos, wi)
t_shadow = timeit(f"shadow march {cfg.shadow_steps}", shadow_j, pos, wi)

# ---- combo row-gather fwd + scatter adjoint (12ch, like the trace)
table12 = jnp.concatenate([mats.albedo.reshape(n, 3),
                           mats.roughness.reshape(n, 1),
                           mats.metallic.reshape(n, 1),
                           mats.normal.reshape(n, 3),
                           gbuf.dist.reshape(n, 1),
                           gbuf.normal_geo.reshape(n, 3)], -1)
idx = jax.random.randint(key, (CHUNK, n), 0, n)
t_gather = timeit("row-gather 12ch fwd", jax.jit(lambda t, i: t[i]),
                  table12, idx)
cot8 = jax.random.normal(key, (CHUNK, n, 8))
t_scatter = timeit(
    "scatter-add adjoint 8ch",
    jax.jit(lambda c, i: jnp.zeros((n, 8)).at[i.reshape(-1)].add(
        c.reshape(-1, 8))), cot8, idx)

# ---- envmap ops
dirs = wi
t_envlut = timeit("envmap bilinear lookup fwd",
                  jax.jit(lambda e, d: em.lookup_bilinear(e, d)),
                  envmap, dirs)
t_envlutb = timeit(
    "envmap bilinear lookup vjp",
    jax.jit(lambda e, d: jax.grad(
        lambda ee: jnp.sum(em.lookup_bilinear(ee, d)))(e)), envmap, dirs)
sampler_j = jax.jit(lambda e, u: em.sample_dir(em.build_sampler(e), u))
u2 = jax.random.uniform(key, (CHUNK, n, 2))
t_envsample = timeit("envmap CDF sample_dir", sampler_j, envmap, u2)
t_envpdf = timeit("envmap pdf_dir",
                  jax.jit(lambda e, d: em.pdf_dir(em.build_sampler(e), d)),
                  envmap, dirs)

# ---- trace / shade / vjp / full step
params = {"mats": mats, "envmap": envmap}


def trace_fn(p, k):
    return trace_step_records(k, cfg, cam, gbuf, p["mats"], p["envmap"])


def shade_fn(p, recs, k):
    return shade_from_records(k, recs, cfg, cam, gbuf, p["mats"],
                              p["envmap"])


trace_j = jax.jit(trace_fn)
shade_j = jax.jit(shade_fn)
t_trace = timeit(f"trace pass ({SPP} spp)", trace_j, params, key)
recs = trace_j(params, key)
t_shade = timeit("shade fwd", shade_j, params, recs, key)


def loss_of_img(img):
    pred = linear_to_srgb(img)
    return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(jnp.abs(pred - gt_srgb))


@jax.jit
def shade_vjp(p, recs, k, ct):
    _, pull = jax.vjp(lambda pp: shade_fn(pp, recs, k), p)
    return pull(ct)[0]


ct = jnp.ones((RES, RES, 3)) / (RES * RES * 3)
t_vjp = timeit("shade vjp (fwd recompute + bwd)", shade_vjp, params, recs,
               key, ct)

optimizer = optax.adam(3e-4)
opt_state = optimizer.init(params)


def loss_fn(p, k):
    return loss_of_img(render(k, cfg, cam, gbuf, p["mats"], p["envmap"]))


@jax.jit
def step(p, s, k):
    loss, grads = jax.value_and_grad(loss_fn)(p, k)
    updates, s = optimizer.update(grads, s, p)
    return optax.apply_updates(p, updates), s, loss


t_step = timeit(f"FULL single-jit step ({SPP} spp)", step, params,
                opt_state, key, reps=2)

n_chunks = max(SPP // CHUNK, 1)
print("\n-- per-step composition estimate --")
print(f"marches: {(t_march + t_shadow) * 3 * n_chunks:8.1f} ms  "
      f"gathers(2b): {t_gather * 2 * n_chunks:6.1f}  "
      f"env(trace): {(t_envsample + t_envpdf) * 3 * n_chunks:6.1f}")
print(f"trace={t_trace:.0f} shade={t_shade:.0f} vjp={t_vjp:.0f} "
      f"sum={t_trace + t_shade + t_vjp:.0f} vs step={t_step:.0f}")
