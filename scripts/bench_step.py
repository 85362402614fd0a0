"""Time ONE full inverse-opt step (render fwd + adjoint + adam) on the
real indoor fixture. Usage:
    python scripts/bench_step.py [RES] [SPP] [CHUNK]
Persistent compilation cache keeps repeat runs fast.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import optax

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 4


def main():
    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr
    from materialist_tpu.ops.color import linear_to_srgb
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import RenderConfig, render

    print(f"[cfg] res={RES} spp={SPP} chunk={CHUNK}", flush=True)
    base = "/root/reference/output_imgs/indoor"
    mat = load_best_results(f"{base}/best_results", roughness_remap=False)
    depth = jnp.asarray(exr.read(f"{base}/depthPred.exr"))[..., :1]
    gt = jnp.asarray(exr.read(f"{base}/gt_image.exr"))

    def rs(x):
        if x.shape[0] != RES:
            return jax.image.resize(jnp.asarray(x), (RES, RES, x.shape[-1]),
                                    "bilinear")
        return jnp.asarray(x)

    depth, gt = rs(depth), rs(gt)
    cam = Camera(RES, RES)
    gbuf = make_gbuffer(depth[..., 0], cam, flip_depth=True)
    mats = Materials(rs(mat["albedo"]), rs(mat["roughness"]),
                     rs(mat["metallic"]), rs(mat["normal"]))
    envmap = jnp.asarray(mat["envmap"])
    gt_srgb = linear_to_srgb(gt)
    print("[inputs ready]", flush=True)

    cfg = RenderConfig(spp=SPP, chunk=CHUNK)
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

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0))
    print(f"[compile+first run] {time.time()-t0:.1f} s  loss={float(loss):.5f}",
          flush=True)

    n_iter = 3
    t0 = time.time()
    for i in range(n_iter):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i + 1))
    float(loss)
    ms = (time.time() - t0) / n_iter * 1000
    print(f"[step] {ms:.1f} ms/iter at {RES}²×{SPP}spp "
          f"(64spp-equiv {ms*64/SPP:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
