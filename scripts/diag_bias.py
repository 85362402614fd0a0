"""Interior-bias hunt (r4): which estimator ingredient holds forward
parity at ~21.3 dB vs the reference's rendered_img.exr (target ≥23)?

Renders the indoor fixture at one config per variant and reports PSNR vs
ref. Variants isolate: indirect-bounce depth, NEE shadow occlusion, the
envmap's texel alignment (a half-texel convention mismatch vs Mitsuba
would shift ALL direct light), march step budget, normal source.

    PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/diag_bias.py \
        [--res 512] [--spp 64] [--variants base,md2,...]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def down(img, res):
    f = img.shape[0] // res
    h, w = res * f, res * f
    if img.ndim == 2:
        img = img[..., None]
    return img[:h, :w].reshape(res, f, res, f, -1).mean(axis=(1, 3))


def shift_env(env, du=0.0, dv=0.0):
    """Fractionally shift the equirect envmap (wrap in u, clamp in v):
    shifting the MAP by +du texels ≈ evaluating the original at u-du."""
    env = np.asarray(env)
    h, w, _ = env.shape
    out = env
    if du:
        lo = int(np.floor(du))
        f = du - lo
        a = np.roll(out, lo, axis=1)
        b = np.roll(out, lo + 1, axis=1)
        out = a * (1 - f) + b * f
    if dv:
        lo = int(np.floor(dv))
        f = dv - lo
        idx = np.arange(h)
        a = out[np.clip(idx - lo, 0, h - 1)]
        b = out[np.clip(idx - lo - 1, 0, h - 1)]
        out = a * (1 - f) + b * f
    return jnp.asarray(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--scene", default="indoor")
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import RenderConfig, render

    base = f"/root/reference/output_imgs/{args.scene}"
    mat = load_best_results(f"{base}/best_results", roughness_remap=False)
    depth_full = exr.read(f"{base}/depthPred.exr")
    ref = down(exr.read(f"{base}/best_results/rendered_img.exr"), args.res)

    res = args.res
    cam = Camera(res, res)
    depth = down(depth_full, res)[..., 0]
    gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=True)
    mats = Materials(jnp.asarray(down(mat["albedo"], res)),
                     jnp.asarray(down(mat["roughness"], res)),
                     jnp.asarray(down(mat["metallic"], res)),
                     jnp.asarray(down(mat["normal"], res)))
    env0 = jnp.asarray(mat["envmap"])

    cfg0 = RenderConfig(spp=args.spp, chunk=min(args.spp, 8),
                        march_steps=24, shadow_steps=16, film_jitter=0.5)

    VARIANTS = {
        "base":    (cfg0, env0),
        "md2":     (cfg0._replace(max_depth=2), env0),
        "md3":     (cfg0._replace(max_depth=3), env0),
        "noshadow": (cfg0._replace(shadow_steps=1, shadow_fine_steps=0),
                     env0),
        "shadow2x": (cfg0._replace(shadow_steps=32, shadow_fine_steps=4),
                     env0),
        "march2x": (cfg0._replace(march_steps=48, fine_steps=12), env0),
        "envu+5":  (cfg0, shift_env(env0, du=+0.5)),
        "envu-5":  (cfg0, shift_env(env0, du=-0.5)),
        "envv+5":  (cfg0, shift_env(env0, dv=+0.5)),
        "envv-5":  (cfg0, shift_env(env0, dv=-0.5)),
        "prednrm": (cfg0._replace(use_mesh_normal=False), env0),
        "mip":     (cfg0._replace(march_impl="mip"), env0),
        # thickness-heuristic sweep: penetration > frac × view distance
        # rejects the crossing as a behind-the-sheet pass-through
        "thk02":   (cfg0._replace(march_interval_frac=0.02), env0),
        "thk05":   (cfg0._replace(march_interval_frac=0.05), env0),
        "thk10":   (cfg0._replace(march_interval_frac=0.10), env0),
        "thk20":   (cfg0._replace(march_interval_frac=0.20), env0),
        "thk50":   (cfg0._replace(march_interval_frac=0.50), env0),
    }
    names = (args.variants.split(",") if args.variants
             else list(VARIANTS.keys()))

    ref_np = np.clip(ref, 0, 2)
    for name in names:
        cfg, env = VARIANTS[name]
        img = np.asarray(render(jax.random.PRNGKey(0), cfg, cam, gbuf,
                                mats, env))
        scale = ref.mean() / max(img.mean(), 1e-9)
        a = np.clip(img * scale, 0, 2)
        mse = ((a - ref_np) ** 2).mean()
        psnr = -10 * np.log10(mse + 1e-12)
        print(f"[{name:9s}] PSNR vs ref {psnr:6.2f} dB  "
              f"(img mean {img.mean():.4f}, scale {scale:.4f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
