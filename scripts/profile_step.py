"""Per-component timing of the inverse-opt step on the real TPU.

Times, at 512² with the indoor fixture: the fused march, the shadow march,
the material gather fwd, one full render chunk fwd, the full step fwd+bwd.
Prints a table; keeps every device call under the watchdog.
"""

import time

import jax
import jax.numpy as jnp
import optax

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.render.scene import Materials, load_best_results, make_gbuffer
from materialist_tpu.render.shader import RenderConfig, render

RES = 512
SPP = 16
CHUNK = 4

print("[load fixtures]", flush=True)
base = "/root/reference/output_imgs/indoor"
mat = load_best_results(f"{base}/best_results", roughness_remap=False)
depth = exr.read(f"{base}/depthPred.exr")
gt = jnp.asarray(exr.read(f"{base}/gt_image.exr"))

print("[fixtures loaded]", flush=True)
cam = Camera(RES, RES)
gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=True)
mats = Materials(jnp.asarray(mat["albedo"]), jnp.asarray(mat["roughness"]),
                 jnp.asarray(mat["metallic"]), jnp.asarray(mat["normal"]))
envmap = jnp.asarray(mat["envmap"])
gt_srgb = linear_to_srgb(gt)


def timeit(name, fn, *args, n=3):
    print(f"[start] {name}", flush=True)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:40s} {dt:10.1f} ms")
    return dt


# ---- march alone (chunk=4 rays per pixel)
from materialist_tpu.ops.pallas.march_kernel import march_fused

n = RES * RES
key = jax.random.PRNGKey(0)
pos = jnp.broadcast_to(gbuf.position.reshape(n, 3), (CHUNK, n, 3))
wi = jax.random.normal(key, (CHUNK, n, 3))
wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)

print("[inputs on device]", flush=True)
march_j = jax.jit(lambda p, d: march_fused(cam, gbuf.dist, gbuf.valid, p, d,
                                           n_steps=24, fine_steps=6))
shadow_j = jax.jit(lambda p, d: march_fused(cam, gbuf.dist, gbuf.valid, p, d,
                                            n_steps=16, fine_steps=2))
t_march = timeit("march_fused 24+6 (chunk4 = 1M rays)", march_j, pos, wi)
t_shadow = timeit("march_fused 16+2 shadow", shadow_j, pos, wi)

# ---- material gather fwd + scatter adjoint
table = jnp.concatenate([mats.albedo.reshape(n, 3),
                         mats.roughness.reshape(n, 1),
                         mats.metallic.reshape(n, 1),
                         mats.normal.reshape(n, 3)], -1)
idx = jax.random.randint(key, (CHUNK, n), 0, n)


@jax.jit
def gather_fwd(t, i):
    return t[i].sum()


@jax.jit
def gather_bwd(t, i):
    return jax.grad(lambda tt: (tt[i] ** 2).sum())(t)


timeit("row-gather (4M rows) fwd", gather_fwd, table, idx)
timeit("row-gather scatter-add adjoint", gather_bwd, table, idx)

# ---- full render chunk fwd, full step fwd+bwd
cfg = RenderConfig(spp=SPP, chunk=CHUNK)

render_j = jax.jit(lambda k: render(k, cfg._replace(spp=CHUNK), cam, gbuf,
                                    mats, envmap))
t_fwd1 = timeit("render fwd 1 chunk (4 spp)", render_j, key)

optimizer = optax.adam(3e-4)
params = {"mats": mats, "envmap": envmap}
opt_state = optimizer.init(params)


def loss_fn(p, k):
    img = render(k, cfg, cam, gbuf, p["mats"], p["envmap"])
    pred = linear_to_srgb(img)
    return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(jnp.abs(pred - gt_srgb))


@jax.jit
def step(p, s, k):
    loss, grads = jax.value_and_grad(loss_fn)(p, k)
    updates, s = optimizer.update(grads, s, p)
    return optax.apply_updates(p, updates), s, loss


t0 = time.time()
params2, opt2, loss = step(params, opt_state, key)
float(loss)
print(f"{'step compile+run':40s} {(time.time()-t0)*1000:10.1f} ms")
t_step = timeit("full step fwd+bwd (16 spp)", step, params, opt_state, key,
                n=2)

print()
print(f"march total per step (est): "
      f"{(t_march + t_shadow) * 3 * (SPP // CHUNK):10.1f} ms")
print(f"step 1024eq-64spp: {t_step * 4 * 4:10.1f} ms")
