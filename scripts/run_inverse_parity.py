"""Reference-budget inverse-optimization parity run on a shipped fixture.

Replicates the fixture's own config (config.json: opt_src=a,
opt_order=[rm, a], opt_env_from=2, spp 64) starting from the shipped
network predictions (*Pred.exr — the same inputs the reference
optimization consumed), then reports recovered-map PSNR vs the
reference's best_results/* (the BASELINE.md parity protocol).

    python scripts/run_inverse_parity.py indoor [--epochs 2000] [--spp 64]
"""

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?", default="indoor")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--trace-every", type=int, default=1,
                    help="re-trace every K epochs, reuse records between "
                         "(InverseOptions.trace_every)")
    ap.add_argument("--time-budget", type=float, default=0.0,
                    help="wall-clock seconds for the whole optimization; "
                         "SaveBest state at the deadline is reported")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr, image as image_io
    from materialist_tpu.opt.loop import InverseOptions, optimize
    from materialist_tpu.render.scene import make_gbuffer

    base = f"/root/reference/output_imgs/{args.scene}"
    cfgj = json.load(open(f"{base}/config.json"))
    out = args.out or f"/root/repo/runs/parity_{args.scene}"
    os.makedirs(out, exist_ok=True)

    def rd(p):
        return jnp.asarray(image_io.read(os.path.join(base, p)))

    mat = {
        "gt_image": jnp.asarray(exr.read(f"{base}/gt_image.exr"))[..., :3],
        "albedo": jnp.clip(rd("albedoPred.exr")[..., :3], 0, 1),
        "roughness": jnp.clip(rd("roughnessPred.png")[..., :1], 0.07, 1),
        "metallic": jnp.clip(rd("metallicPred.png")[..., :1], 0, 1),
        "normal": rd("normalPred.exr")[..., :3],
    }
    depth = jnp.asarray(exr.read(f"{base}/depthPred.exr"))[..., 0]
    mask = None
    if os.path.exists(f"{base}/mesh_mask.png"):
        m = image_io.read(f"{base}/mesh_mask.png")
        mask = jnp.asarray((m[..., 0] if m.ndim == 3 else m) > 0.5)

    cam = Camera(512, 512)
    gbuf = make_gbuffer(depth, cam, flip_depth=True, mask=mask)
    opts = InverseOptions(
        opt_src=cfgj["opt_src"], opt_order=tuple(cfgj["opt_order"]),
        model_name=cfgj["model_name"], use_mask=cfgj.get("use_mask", False),
        opt_env_from=cfgj.get("opt_env_from", 0),
        output_type=cfgj.get("output_type", "arm"),
        use_mesh_normal=cfgj.get("use_mesh_normal", True),
        spp=args.spp, num_epochs=args.epochs, chunk=args.chunk,
        trace_every=args.trace_every,
        time_budget_s=args.time_budget,
        frame_every=0)
    print(f"[parity {args.scene}] epochs≤{args.epochs} spp={args.spp} "
          f"trace_every={args.trace_every} "
          f"config={cfgj['opt_order']} model={cfgj['model_name']}",
          flush=True)
    t0 = time.time()
    best = optimize(gbuf, cam, mat, out, opts)
    print(f"[parity] optimization done in {(time.time()-t0)/60:.1f} min, "
          f"best loss {best['loss']:.5f}", flush=True)

    # recovered-map PSNR vs the reference's best_results
    print(f"[parity {args.scene}] recovered-map PSNR vs reference:")
    for k, fname in (("albedo", "albedo.exr"), ("roughness", "roughness.exr"),
                     ("metallic", "metallic.exr"), ("envmap", "envmap.hdr")):
        ours = np.asarray(best[k], np.float32)
        ref = np.asarray(image_io.read(
            f"{base}/best_results/{fname}"), np.float32)
        if ref.ndim == 3 and ours.ndim == 3 and ref.shape[-1] != ours.shape[-1]:
            ref = ref[..., :ours.shape[-1]]
        rng = max(float(ref.max() - ref.min()), 1e-6)
        mse = float(np.mean((ours - ref) ** 2))
        psnr = 10 * np.log10(rng * rng / max(mse, 1e-12))
        print(f"    {k:10s} {psnr:6.2f} dB  (ours mean {ours.mean():.3f} "
              f"ref mean {ref.mean():.3f})", flush=True)
        if k == "envmap":
            # gauge-split diagnostic: envmap absolute scale trades off
            # against estimator brightness (dimmer env × brighter render
            # = same image); the scale-aligned number isolates the
            # RECOVERED STRUCTURE from that gauge (see
            # runs/forward_parity_r5.json brightness_ratio evidence)
            s = float(ref.mean() / max(ours.mean(), 1e-9))
            mse_s = float(np.mean((ours * s - ref) ** 2))
            psnr_s = 10 * np.log10(rng * rng / max(mse_s, 1e-12))
            print(f"    {k:10s} {psnr_s:6.2f} dB scale-aligned "
                  f"(x{s:.3f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
