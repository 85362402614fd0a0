"""Forward rendering / relighting CLI — counterpart of render_final.py.

Modes (render_final.py:420-449): ``real`` re-renders the optimized scene
under its (or a new) envmap with optional masked edits; ``oi`` renders
with inserted objects; ``rolling`` writes the rotating-envmap animation
(working here; broken in the released reference, SURVEY.md §2.2).

Usage: python -m materialist_tpu.cli.render_final --save_name indoor
           --mode real [--env_path path.hdr] [--input_path dir]
           [--save_path dir] [--frames 36] [--rotation_step 10]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from materialist_tpu import config as gconfig
from materialist_tpu.camera import Camera
from materialist_tpu.cli import common
from materialist_tpu.io import image as image_io
from materialist_tpu.render import edits as edits_mod
from materialist_tpu.render import forward
from materialist_tpu.render.scene import Materials, load_best_results


def _load_scene(save_name, input_path):
    scene_dir = os.path.join(input_path or gconfig.OUT_DIR, save_name)
    mat_dir = os.path.join(scene_dir, "best_results")
    mat = load_best_results(mat_dir)
    gbuf = common.load_scene_gbuffer(scene_dir)
    cam = Camera(mat["albedo"].shape[0], mat["albedo"].shape[1])
    return scene_dir, mat, gbuf, cam


def _materials(mat, use_mesh_normal, gbuf):
    normal = mat["normal"]
    return Materials(jnp.asarray(mat["albedo"]),
                     jnp.asarray(mat["roughness"]),
                     jnp.asarray(mat["metallic"]),
                     jnp.asarray(normal))


def render_real(save_name, env_path=None, edit=None, n_iter=10,
                input_path=None, save_path=None, spp=64):
    """--mode real (render_final.py:241-260 → render_w_mi :148-203)."""
    edit = edit or {"albedo": None, "roughness": None, "metallic": None}
    scene_dir, mat, gbuf, cam = _load_scene(save_name, input_path)
    env_path = common.resolve_envmap(save_name, env_path, input_path)
    envmap = image_io.read(env_path)
    env_id = os.path.basename(env_path)[:-4]

    use_mesh_normal = "mn" not in save_name
    print("Use Mesh Normal" if use_mesh_normal else "Use Optimized Normal")
    edit_flag = edits_mod.apply_edits(mat, edit)
    mats = _materials(mat, use_mesh_normal, gbuf)

    img = forward.render_averaged(gbuf, cam, mats, envmap, n_iter=n_iter,
                                  spp=spp)
    out_dir = os.path.join(save_path or gconfig.OUT_DIR, save_name)
    os.makedirs(out_dir, exist_ok=True)
    stem = f"mi_{save_name}_{env_id}_{edit_flag}"
    image_io.write(os.path.join(out_dir, f"{stem}.exr"), img)
    image_io.write(os.path.join(out_dir, f"{stem}.png"),
                   np.clip(img, 0, 1) ** (1 / 2.2), linear_input=False)
    print("Wrote file to", os.path.join(out_dir, f"{stem}.png"))
    return img


def render_io(save_name, env_path=None, input_path=None, save_path=None,
              n_iter=10, spp=32):
    """--mode oi: object insertion (render_final.py:263-288 → :207-237)."""
    from materialist_tpu.render import insertion
    scene_dir, mat, gbuf, cam = _load_scene(save_name, input_path)
    env_path = common.resolve_envmap(save_name, env_path, input_path,
                                     prefer_opt=True)
    envmap = image_io.read(env_path)
    env_id = os.path.basename(env_path)[:-4]
    img = insertion.render_insert(scene_dir, mat, gbuf, cam, envmap,
                                  n_iter=n_iter, spp=spp)
    out_dir = os.path.join(save_path or gconfig.OUT_DIR, save_name)
    os.makedirs(out_dir, exist_ok=True)
    stem = f"mi_oi_{save_name}_{env_id}"
    image_io.write(os.path.join(out_dir, f"{stem}.exr"), img)
    image_io.write(os.path.join(out_dir, f"{stem}.png"),
                   np.clip(img, 0, 1) ** (1 / 2.2), linear_input=False)
    print("Wrote file to", os.path.join(out_dir, f"{stem}.png"))
    return img


def render_rolling(save_name, env_path=None, frames=36, rotation_step=10.0,
                   edit=None, n_iter=1, input_path=None, save_path=None):
    """--mode rolling (render_final.py:300-418, fixed)."""
    edit = edit or {}
    scene_dir, mat, gbuf, cam = _load_scene(save_name, input_path)
    env_path = common.resolve_envmap(save_name, env_path, input_path)
    envmap = image_io.read(env_path)
    env_id = os.path.basename(env_path)[:-4]
    edit_flag = edits_mod.apply_edits(mat, edit) if edit else ""
    use_mesh_normal = "mn" not in save_name
    mats = _materials(mat, use_mesh_normal, gbuf)
    out_dir = os.path.join(save_path or gconfig.OUT_DIR, save_name)
    os.makedirs(out_dir, exist_ok=True)
    return forward.render_rolling(gbuf, cam, mats, envmap, out_dir,
                                  save_name, env_id, frames=frames,
                                  rotation_step=rotation_step,
                                  n_iter=n_iter, edit_flag=edit_flag)


def parse_args():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        description="re-render / relight an optimized scene")
    p.add_argument("--env_path", default=None, type=str)
    p.add_argument("--save_name", required=True, type=str)
    p.add_argument("--mode", required=True, type=str,
                   choices=["real", "oi", "rolling"])
    p.add_argument("--input_path", default=None, type=str)
    p.add_argument("--save_path", default=None, type=str)
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--rotation_step", type=float, default=10.0)
    p.add_argument("--n_iter", type=int, default=10)
    p.add_argument("--spp", type=int, default=64)
    return p.parse_args()


def main():
    args = parse_args()
    edit = {"albedo": None, "roughness": None, "metallic": None}
    if args.mode == "real":
        render_real(args.save_name, args.env_path, edit=edit,
                    n_iter=args.n_iter, input_path=args.input_path,
                    save_path=args.save_path, spp=args.spp)
    elif args.mode == "oi":
        render_io(args.save_name, args.env_path,
                  input_path=args.input_path, save_path=args.save_path,
                  n_iter=args.n_iter)
    elif args.mode == "rolling":
        render_rolling(args.save_name, args.env_path, frames=args.frames,
                       rotation_step=args.rotation_step, edit=edit,
                       n_iter=args.n_iter, input_path=args.input_path,
                       save_path=args.save_path)


if __name__ == "__main__":
    main()
