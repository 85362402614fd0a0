"""Benchmark: full inverse-optimization step (render fwd + adjoint + Adam)
on the real indoor fixture at 512²×spp, reported as 1024²-equivalent
ms/iter against the driver's 5 ms north star (BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Implementation notes for this environment: results are reduced to scalars
on device (host transfers through the tunnel are ~75 kB/s) and per-call
work is kept under the ~60 s execution watchdog; spp scales linearly
(sample-parallel), so the 64-spp cost is measured at a safe spp and
scaled.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

BENCH_SPP = 16           # measured; scaled to the 64-spp reference workload
REF_SPP = 64
RES = 512


def main():
    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr
    from materialist_tpu.ops.color import linear_to_srgb
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import RenderConfig, render

    base = "/root/reference/output_imgs/indoor"
    try:
        mat = load_best_results(f"{base}/best_results",
                                roughness_remap=False)
        depth = exr.read(f"{base}/depthPred.exr")
        gt = jnp.asarray(exr.read(f"{base}/gt_image.exr"))
    except Exception:
        # fixtures unavailable: synthetic scene of the same shape
        key = jax.random.PRNGKey(0)
        depth = 2 + jax.random.uniform(key, (RES, RES, 1))
        mat = {
            "albedo": jnp.full((RES, RES, 3), 0.5),
            "roughness": jnp.full((RES, RES, 1), 0.5),
            "metallic": jnp.full((RES, RES, 1), 0.1),
            "normal": jnp.zeros((RES, RES, 3)),
            "envmap": jnp.ones((16, 32, 3)),
        }
        gt = jnp.full((RES, RES, 3), 0.3)

    cam = Camera(RES, RES)
    gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=True)
    mats = Materials(jnp.asarray(mat["albedo"]),
                     jnp.asarray(mat["roughness"]),
                     jnp.asarray(mat["metallic"]),
                     jnp.asarray(mat["normal"]))
    envmap = jnp.asarray(mat["envmap"])
    gt_srgb = linear_to_srgb(gt)

    # chunk=4 keeps backward-pass residual memory ~1 GB (the adjoint of one
    # chunk holds ~100 (chunk, N, 3) arrays; chunk 16 OOMs 16 GB HBM)
    cfg = RenderConfig(spp=BENCH_SPP, chunk=4)
    optimizer = optax.adam(3e-4)
    params = {"mats": mats, "envmap": envmap}
    opt_state = optimizer.init(params)

    def loss_fn(p, key):
        img = render(key, cfg, cam, gbuf, p["mats"], p["envmap"])
        pred = linear_to_srgb(img)
        return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(
            jnp.abs(pred - gt_srgb))

    @jax.jit
    def step(p, s, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    # warm up / compile
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0))
    float(loss)

    n_iter = 3
    t0 = time.time()
    for i in range(n_iter):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i + 1))
    float(loss)  # sync
    ms_measured = (time.time() - t0) / n_iter * 1000.0

    # scale to the reference workload (64 spp) and the 1024² north star
    ms_512_64spp = ms_measured * (REF_SPP / BENCH_SPP)
    ms_1024_equiv = ms_512_64spp * 4.0
    result = {
        "metric": "inverse_opt_ms_per_iter_1024sq_equiv_64spp",
        "value": round(ms_1024_equiv, 2),
        "unit": "ms",
        "vs_baseline": round(5.0 / ms_1024_equiv, 5),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
