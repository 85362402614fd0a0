"""Generate a synthetic MG-layout training dataset with the framework's
own renderer (the tpu-native replacement for the reference's BlenderProc
stage — Material_net/mydataset.py expects ``<scene>/<i>_im.exr`` plus
``_albedo/_material/_depth/_normal[/_mask]`` siblings).

Each scene is a random heightfield with piecewise-random ARM maps; the
image is rendered by render/shader.py under a random two-band envmap, so
the im->maps mapping the net learns is exactly the light transport the
inverse stage inverts.

    python scripts/make_mg_dataset.py OUT_DIR [--scenes 2] [--per-scene 2]
                                      [--height 70] [--width 98] [--spp 16]
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def make_scene(key, h, w):
    """Random materials + geometry for one sample."""
    ks = jax.random.split(key, 8)
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w),
                          indexing="ij")
    fx, fy = jax.random.uniform(ks[0], (2,), minval=1.0, maxval=4.0)
    depth = 2.0 + 0.4 * jnp.sin(fx * 3 * xx) * jnp.cos(fy * 2 * yy) \
        + 0.2 * jax.random.uniform(ks[1], ())
    # piecewise-constant albedo from a random 4x4 palette grid
    pal = jax.random.uniform(ks[2], (4, 4, 3), minval=0.05, maxval=0.95)
    gi = jnp.clip(((yy + 1) * 2).astype(jnp.int32), 0, 3)
    gj = jnp.clip(((xx + 1) * 2).astype(jnp.int32), 0, 3)
    albedo = pal[gi, gj]
    rough = jnp.clip(0.3 + 0.5 * jnp.sin(fy * 4 * xx + fx)[..., None],
                     0.07, 1.0)
    metal = (jax.random.uniform(ks[3], ()) < 0.5).astype(jnp.float32) * \
        jnp.clip(0.8 * (xx > 0).astype(jnp.float32)[..., None], 0, 1)
    env_top = jax.random.uniform(ks[4], (3,), minval=0.8, maxval=2.5)
    env_bot = jax.random.uniform(ks[5], (3,), minval=0.05, maxval=0.4)
    env = jnp.concatenate([jnp.broadcast_to(env_top, (8, 32, 3)),
                           jnp.broadcast_to(env_bot, (8, 32, 3))], axis=0)
    return depth, albedo, rough, metal, env


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--per-scene", type=int, default=2)
    ap.add_argument("--height", type=int, default=70)
    ap.add_argument("--width", type=int, default=98)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    generate(args.out, args.scenes, args.per_scene, args.height,
             args.width, args.spp, args.seed)
    return 0


def generate(out, scenes, per_scene, h, w, spp, seed=0):
    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr
    from materialist_tpu.render.scene import Materials, make_gbuffer
    from materialist_tpu.render.shader import RenderConfig, render

    cam = Camera(h, w)
    cfg = RenderConfig(spp=spp, chunk=min(8, spp), march_steps=8,
                       shadow_steps=8, march_impl="exact",
                       march_vectorized=True)
    scene_names = []
    key = jax.random.PRNGKey(seed)
    for s in range(scenes):
        sdir = os.path.join(out, f"scene{s:03d}")
        os.makedirs(sdir, exist_ok=True)
        scene_names.append(f"scene{s:03d}")
        for i in range(per_scene):
            key, k1, k2 = jax.random.split(key, 3)
            depth, albedo, rough, metal, env = make_scene(k1, h, w)
            gbuf = make_gbuffer(depth, cam, flip_depth=False)
            mats = Materials(albedo, rough, metal, gbuf.normal_geo)
            img = np.asarray(render(k2, cfg, cam, gbuf, mats, env))
            pre = os.path.join(sdir, f"{i}")
            exr.write(pre + "_im.exr", img, half=True)
            exr.write(pre + "_albedo.exr", np.asarray(albedo), half=True)
            # material pack: R=roughness G=metallic B=specular(0.5 const)
            matpack = np.concatenate(
                [np.asarray(rough), np.asarray(metal),
                 np.full((h, w, 1), 0.5, np.float32)], axis=-1)
            exr.write(pre + "_material.exr", matpack, half=True)
            # depth is stored in mm like the reference data
            # (mydataset.py SCENE_SCALE=1e-3 on load)
            exr.write(pre + "_depth.exr",
                      np.asarray(depth)[..., None] * 1e3, half=True)
            exr.write(pre + "_normal.exr", np.asarray(gbuf.normal_geo),
                      half=True)
    with open(os.path.join(out, "train.txt"), "w") as f:
        f.write("\n".join(scene_names) + "\n")
    print(f"wrote {scenes * per_scene} samples to {out}")


if __name__ == "__main__":
    sys.exit(main())
