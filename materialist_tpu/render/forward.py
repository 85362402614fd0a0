"""Forward re-rendering / relighting entry points.

API equivalents of render_final.py's render_w_mi (:148-203) and
render_rolling_envmap (:300-418): n_iter independent renders, each
denoised (render/denoise.py replaces the OptiX denoiser) and averaged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera
from materialist_tpu.io import image as image_io
from materialist_tpu.io import video as video_io
from materialist_tpu.ops import envmap as em
from materialist_tpu.render import bsdf as bsdf_mod
from materialist_tpu.render.denoise import atrous_denoise
from materialist_tpu.render.scene import GBuffer, Materials
from materialist_tpu.render.shader import RenderConfig, render, \
    render_with_bsdf


def render_averaged(gbuf: GBuffer, cam: Camera, mats: Materials, envmap,
                    n_iter: int = 10, spp: int = 64, denoise: bool = True,
                    seed: int = 0, bsdf=None, chunk: int = 8,
                    film_jitter: float = 0.5) -> np.ndarray:
    """n_iter × (spp render [+ denoise]) averaged (render_final.py:193-197).

    Continuous in-pixel film sampling is on by default (box halfwidth 0.5
    — the analog of Mitsuba's hdrfilm reconstruction-filter sampling).
    Each pass is a separate jit call so per-execution time stays bounded;
    averaging happens on device, one image transfer at the end.
    """
    cfg = RenderConfig(spp=spp, chunk=min(chunk, spp),
                       film_jitter=film_jitter)
    envmap = jnp.asarray(envmap)

    if bsdf is None:
        fn = jax.jit(lambda k: render(k, cfg, cam, gbuf, mats, envmap))
    else:
        fn = jax.jit(lambda k: render_with_bsdf(k, cfg, cam, gbuf, mats,
                                                envmap, bsdf))
    acc = None
    for i in range(n_iter):
        img = fn(jax.random.PRNGKey(seed + i))
        if denoise:
            img = atrous_denoise(img, albedo=mats.albedo,
                                 normal=mats.normal)
        acc = img if acc is None else acc + img
    return np.asarray(acc / n_iter)


def render_rolling(gbuf: GBuffer, cam: Camera, mats: Materials, envmap,
                   output_dir: str, save_name: str, env_id: str,
                   frames: int = 36, rotation_step: float = 10.0,
                   n_iter: int = 1, spp: int = 32,
                   edit_flag: str = "") -> str:
    """Rolling-envmap relight animation (render_final.py:300-418) —
    implemented *working* (the released reference crashes on --mode
    rolling, SURVEY.md §2.2 quirks)."""
    anim_dir = os.path.join(output_dir, "rolling_envmap_animation")
    os.makedirs(anim_dir, exist_ok=True)
    frame_paths = []
    for f in range(frames):
        angle = f * rotation_step
        rolled = em.rotate(jnp.asarray(envmap), angle)
        img = render_averaged(gbuf, cam, mats, rolled, n_iter=n_iter,
                              spp=spp, seed=f)
        srgb = np.clip(img, 0, 1) ** (1 / 2.2)
        p = os.path.join(anim_dir, f"frame_{f:04d}.png")
        image_io.write(p, srgb, linear_input=False)
        frame_paths.append(p)
        print(f"frame {f + 1}/{frames} (angle {angle}°)", flush=True)
    mp4 = os.path.join(output_dir,
                       f"rolling_envmap_{save_name}_{env_id}.mp4")
    video_io.write_video(frame_paths, mp4, fps=10)
    gif = os.path.join(output_dir,
                       f"rolling_envmap_{save_name}_{env_id}.gif")
    video_io.write_gif(frame_paths, gif, fps=10)
    return anim_dir
