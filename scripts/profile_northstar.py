"""Component profile of the ACCUMULATED north-star step (1024²×64spp)
exactly as bench.py composes it: plan_step groups, trace/shade split,
persistent records. Times each host-level jit call separately plus the
raw dispatch latency of this environment's device tunnel.

Usage: python scripts/profile_northstar.py [RES] [SPP]
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
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.opt.plan import plan_step
from materialist_tpu.render.scene import Materials, load_best_results, \
    make_gbuffer
from materialist_tpu.render.shader import (RenderConfig,
                                           shade_from_records,
                                           trace_step_records)

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 64

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

plan = plan_step(RES, SPP)
G = plan.groups
cfg = RenderConfig(spp=SPP // G, chunk=min(plan.chunk, SPP // G),
                   replay_blob=plan.replay_blob)
print(f"== RES={RES} SPP={SPP} plan: groups={G} chunk={cfg.chunk} "
      f"replay={plan.replay_blob} keep={plan.keep_records}", flush=True)

params = {"mats": mats, "envmap": envmap}


def fetch(x):
    leaves = jax.tree.leaves(x)
    s = 0.0
    for l in leaves[:2]:
        s += float(jnp.ravel(l)[0].astype(jnp.float32))
    return s


def timeit(name, fn, *args, reps=2):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:40s} {dt:9.1f} ms", flush=True)
    return dt, out


# raw dispatch latency
noop = jax.jit(lambda x: x + 1.0)
t_disp, _ = timeit("noop dispatch+fetch roundtrip", noop,
                   jnp.zeros(()), reps=8)

key = jax.random.PRNGKey(0)
trace_j = jax.jit(lambda p, k: trace_step_records(k, cfg, cam, gbuf,
                                                  p["mats"], p["envmap"]))
shade_j = jax.jit(lambda p, r, k: shade_from_records(k, r, cfg, cam, gbuf,
                                                     p["mats"], p["envmap"]))


def loss_of_img(img):
    pred = linear_to_srgb(img)
    return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(jnp.abs(pred - gt_srgb))


loss_vg = jax.jit(jax.value_and_grad(loss_of_img))


@jax.jit
def shade_vjp(p, r, k, ct):
    _, pull = jax.vjp(
        lambda pp: shade_from_records(k, r, cfg, cam, gbuf, pp["mats"],
                                      pp["envmap"]), p)
    return pull(ct)[0]


t_trace, recs = timeit(f"trace one group ({cfg.spp} spp)", trace_j,
                       params, key)
t_shade, img = timeit("shade fwd one group", shade_j, params, recs, key)
t_loss, (lv, ct) = timeit("loss value_and_grad", loss_vg, img)
t_vjp, _ = timeit("shade vjp one group", shade_vjp, params, recs, key,
                  jax.tree.map(lambda x: x / G, ct))

optimizer = optax.adam(3e-4)
opt_state = optimizer.init(params)


@jax.jit
def apply_updates(p, s, grads):
    updates, s = optimizer.update(grads, s, p)
    return optax.apply_updates(p, updates), s


g0 = shade_vjp(params, recs, key, ct)
t_apply, _ = timeit("adam apply_updates", apply_updates, params,
                    opt_state, g0)

amort = G * (t_shade + t_vjp) + t_loss + t_apply
print(f"\npredicted amortized step = {G}*(shade {t_shade:.0f} + vjp "
      f"{t_vjp:.0f}) + loss {t_loss:.0f} + apply {t_apply:.0f} "
      f"= {amort:.0f} ms")
print(f"predicted trace_all = {G}*{t_trace:.0f} = {G * t_trace:.0f} ms")
print(f"dispatch overhead share ≈ {(2 * G + 2) * t_disp:.0f} ms "
      f"({2 * G + 2} calls × {t_disp:.0f})")
