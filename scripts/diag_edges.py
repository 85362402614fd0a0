"""Edge-region PSNR diagnostic for the golden forward render (VERDICT r2
next-step 4): where does the remaining parity gap vs the reference's
rendered_img.exr live — depth-discontinuity edges or the interior?

Splits pixels by proximity to a depth discontinuity (the analog of the
reference's boundary triangles, mesh_recon.py:126-175) and reports PSNR
and MSE share per region, plus the top error rows/cols.

    JAX_PLATFORMS=cpu python scripts/diag_edges.py [--res 128] [--spp 16]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def down(img, res):
    f = img.shape[0] // res
    h, w = res * f, res * f
    if img.ndim == 2:
        img = img[..., None]
    return img[:h, :w].reshape(res, f, res, f, -1).mean(axis=(1, 3))


def psnr(a, b):
    return -10 * np.log10(np.mean((a - b) ** 2) + 1e-12)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--scene", default="indoor")
    ap.add_argument("--jitter", type=float, default=0.0)
    ap.add_argument("--save", default=None, help="write error map PNG")
    ap.add_argument("--bg-fill", type=int, default=0,
                    help="march_bg_fill iterations (0 = off; measured "
                         "r4: 16 costs ~0.2 dB on indoor)")
    args = ap.parse_args()

    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr, image
    from materialist_tpu.render.scene import (Materials, load_best_results,
                                              make_gbuffer)
    from materialist_tpu.render.shader import RenderConfig, render

    base = f"/root/reference/output_imgs/{args.scene}"
    mat = load_best_results(f"{base}/best_results", roughness_remap=False)
    depth_full = exr.read(f"{base}/depthPred.exr")
    ref = down(exr.read(f"{base}/best_results/rendered_img.exr"), args.res)
    gt = down(exr.read(f"{base}/gt_image.exr"), args.res)

    mask = None
    if os.path.exists(f"{base}/mesh_mask.png"):
        m = image.read(f"{base}/mesh_mask.png")
        m = m[..., :1] if m.ndim == 3 else m[..., None]
        mask = down(m, args.res)[..., 0] > 0.5

    res = args.res
    cam = Camera(res, res)
    depth = down(depth_full, res)[..., 0]
    gbuf = make_gbuffer(jnp.asarray(depth), cam, flip_depth=True, mask=mask)
    mats = Materials(jnp.asarray(down(mat["albedo"], res)),
                     jnp.asarray(down(mat["roughness"], res)),
                     jnp.asarray(down(mat["metallic"], res)),
                     jnp.asarray(down(mat["normal"], res)))
    cfg = RenderConfig(spp=args.spp, chunk=min(args.spp, 8),
                       march_steps=16 if args.res <= 256 else 24,
                       shadow_steps=12 if args.res <= 256 else 16,
                       march_vectorized=True,
                       film_jitter=args.jitter,
                       march_bg_fill=args.bg_fill)
    img = np.asarray(render(jax.random.PRNGKey(0), cfg, cam, gbuf, mats,
                            jnp.asarray(mat["envmap"])))

    # edge mask: depth-gradient discontinuity, dilated 1px — the pixels
    # whose triangles the reference's mesher marks as boundary
    d = np.asarray(depth)
    gx = np.abs(np.diff(d, axis=1, append=d[:, -1:]))
    gy = np.abs(np.diff(d, axis=0, append=d[-1:, :]))
    rel = np.maximum(gx, gy) / np.maximum(d, 1e-6)
    edge = rel > 0.03
    for _ in range(1):
        e = edge.copy()
        e[1:] |= edge[:-1]; e[:-1] |= edge[1:]
        e[:, 1:] |= edge[:, :-1]; e[:, :-1] |= edge[:, 1:]
        edge = e

    for name, tgt in (("ref", ref), ("gt", gt)):
        scale = tgt.mean() / img.mean()
        a = np.clip(img * scale, 0, 2)
        b = np.clip(tgt, 0, 2)
        se = ((a - b) ** 2).mean(-1)
        tot = psnr(a, b)
        pe = -10 * np.log10(se[edge].mean() + 1e-12)
        pi = -10 * np.log10(se[~edge].mean() + 1e-12)
        share = se[edge].sum() / se.sum()
        print(f"[{args.scene} vs {name}] PSNR {tot:5.2f} dB | edge "
              f"({edge.mean()*100:4.1f}% px) {pe:5.2f} dB | interior "
              f"{pi:5.2f} dB | edge MSE share {share*100:4.1f}%",
              flush=True)
        if name == "ref" and args.save:
            err = se / se.max()
            image.write(args.save, np.stack([err, edge * 0.5, 0 * err], -1))
            print(f"    error map -> {args.save}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
