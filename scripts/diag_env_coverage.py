"""Envmap observability diagnostic (r5: why does recovered-envmap PSNR
vs the reference's solution plateau ~10 dB while the material maps hit
their targets?).

The envmap is observed ONLY through the scene: each path vertex
contributes 4 bilinear taps at its NEE sample direction and 4 at its
lobe (miss) direction — exactly the uv decisions the trace records
(render/shader.py rec_uvi). Texels outside the union of those taps get
ZERO data-term gradient; their recovered content is determined purely by
the PosMLP prior (SIREN weights random init + softplus head), so two
independent optimizations (ours vs the reference's torch run) agree only
up to the prior in that region.

This script traces the indoor fixture at the production workload,
histograms the recorded taps over the 16x32 envmap grid (gate-weighted:
shadowed NEE taps and absorbed lobe taps don't contribute gradient), and
reports (a) texel coverage, (b) the PSNR-vs-reference split between
covered and uncovered texels for a recovered envmap.

    python scripts/diag_env_coverage.py [--recovered runs/.../envmap.hdr]
"""

import argparse
import json
import os
import sys

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="indoor")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--recovered", default=None,
                    help="recovered envmap.hdr to split PSNR by coverage")
    args = ap.parse_args()

    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr, image as image_io
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import (RenderConfig,
                                               trace_step_records)
    from materialist_tpu.render import bsdf as bsdf_mod

    base = f"/root/reference/output_imgs/{args.scene}"
    mat = load_best_results(f"{base}/best_results", roughness_remap=False)
    depth = jnp.asarray(exr.read(f"{base}/depthPred.exr"))[..., 0]
    res = args.res

    def rs(x, ch):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[..., None]
        x = x[..., :ch]
        if x.shape[0] != res:
            x = jax.image.resize(x, (res, res, ch), "bilinear")
        return x

    cam = Camera(res, res)
    gbuf = make_gbuffer(rs(depth, 1)[..., 0], cam, flip_depth=True)
    mats = Materials(rs(mat["albedo"], 3), rs(mat["roughness"], 1),
                     rs(mat["metallic"], 1), rs(mat["normal"], 3))
    env = jnp.asarray(mat["envmap"])
    eh, ew = env.shape[0], env.shape[1]

    cfg = RenderConfig(spp=args.spp, chunk=8, film_jitter=0.5)
    bsdf = bsdf_mod.disney(mats)

    hist = np.zeros((eh, ew), np.float64)
    n_chunks = args.spp // cfg.chunk
    for c in range(n_chunks):
        key = jax.random.fold_in(jax.random.PRNGKey(0), c)
        records = trace_step_records(key, cfg, cam, gbuf, mats, env,
                                     bsdf=bsdf)
        for rec in records:
            shadowed, hit_ok = rec[0], rec[1]
            uvi = rec[9] if rec[9] is not None else None
            aux, recb = rec[11], rec[12]
            if uvi is None and recb is not None:
                # fused packed layout: recb = [pdf_e, pdf_at, wi_e(3),
                # uvf(4), uvi(4)]; aux = [win(3), gate_nee, gate_miss]
                uvi = np.asarray(recb[..., 9:13].astype(jnp.float32))
                g_nee = np.asarray(aux[..., 3].astype(jnp.float32))
                g_miss = np.asarray(aux[..., 4].astype(jnp.float32))
            else:
                uvi = np.asarray(uvi.astype(jnp.float32))
                g_nee = np.asarray(~np.asarray(shadowed), np.float32)
                g_miss = np.asarray(~np.asarray(hit_ok), np.float32)
            ue, ve, ub, vb = (uvi[..., 0], uvi[..., 1], uvi[..., 2],
                              uvi[..., 3])
            for (u, v, g) in ((ue, ve, g_nee), (ub, vb, g_miss)):
                uu = np.clip(u.astype(np.int64), 0, eh - 1).ravel()
                vv = np.clip(v.astype(np.int64), 0, ew - 1).ravel()
                np.add.at(hist, (uu, vv), g.ravel())
        del records
    taps_total = hist.sum()
    covered = hist > (taps_total / (eh * ew) * 0.01)   # >1% of uniform
    print(f"[env-coverage] gate-weighted taps total {taps_total:.0f}; "
          f"texels covered {covered.sum()}/{eh * ew} "
          f"({covered.mean():.1%})", flush=True)
    rows = covered.mean(axis=1)
    print("[env-coverage] per-row coverage:",
          np.array2string(rows, precision=2), flush=True)

    out = {"covered_frac": float(covered.mean()),
           "taps_total": float(taps_total),
           "row_coverage": [round(float(r), 3) for r in rows]}

    if args.recovered:
        ours = image_io.read(args.recovered).astype(np.float32)
        ref = image_io.read(
            f"{base}/best_results/envmap.hdr").astype(np.float32)

        def psnr(a, b, m):
            if m.sum() == 0:
                return float("nan")
            rng = max(float(b.max() - b.min()), 1e-6)
            mse = float((((a - b) ** 2).mean(-1) * m).sum() / m.sum())
            return 10 * np.log10(rng * rng / max(mse, 1e-12))

        m = covered.astype(np.float64)
        out["psnr_covered_db"] = round(psnr(ours, ref, m), 2)
        out["psnr_uncovered_db"] = round(psnr(ours, ref, 1 - m), 2)
        out["psnr_all_db"] = round(psnr(ours, ref, np.ones_like(m)), 2)
        print(f"[env-coverage] PSNR vs reference: all "
              f"{out['psnr_all_db']} dB | covered {out['psnr_covered_db']}"
              f" dB | uncovered {out['psnr_uncovered_db']} dB", flush=True)

    path = os.path.join(_REPO, "runs", "env_coverage_r5.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[env-coverage] wrote {path}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
