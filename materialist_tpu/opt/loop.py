"""Inverse-optimization driver: alternate envmap and material recovery.

Behavioral rebuild of ``optimize_envmap_ARMN`` (inverse_img_w_mi.py:106-599)
on the TPU renderer: up to 3 outer loops alternating an envmap phase and a
material phase, early-stopped at three levels (per-phase patience, global
patience 2 @ 2.5%), with SaveBest persisting the argmin-MSE state to
``best_results/`` after every phase.

TPU-first differences from the reference (documented, not accidental):
* each epoch is ONE jitted step (render fwd + adjoint + optax update) —
  no torch↔drjit bridge, no host round-trip except the loss scalar;
* per-epoch PRNG is a folded jax.random key, not np.random seeds
  (inverse_img_w_mi.py:62);
* frames are optional (frame_every=0 disables) because device→host image
  transfers may be expensive; the files written match §2.10 when enabled.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from materialist_tpu import config as gconfig
from materialist_tpu.camera import Camera
from materialist_tpu.io import image as image_io
from materialist_tpu.io import video as video_io
from materialist_tpu.models import posmlp
from materialist_tpu.opt.callbacks import EarlyStopping, SaveBest
from materialist_tpu.opt import schedules
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.opt.step import make_phase_step
from materialist_tpu.render.scene import GBuffer, Materials
from materialist_tpu.render.shader import RenderConfig
from materialist_tpu.utils.profiling import JsonlLogger, PhaseTimer


@dataclasses.dataclass
class InverseOptions:
    """CLI-level knobs (inverse_img_w_mi.py:771-784 + hardcoded defaults)."""
    opt_src: str = "a"
    opt_order: Sequence[str] = ("rm", "a")
    model_name: str = "pos_mlp"        # pos_mlp | none
    use_mask: bool = False
    opt_env_from: int = 0
    output_type: str = "arm"           # arm | armn
    use_mesh_normal: bool = True
    spp: int = gconfig.DEFAULT_SPP
    num_epochs: int = gconfig.NUM_EPOCHS
    env_hw: tuple = (gconfig.ENV_H, gconfig.ENV_W)
    scale_delta: float = 0.1
    frame_every: int = 10              # 0 disables frame/video output
    max_loops: int = 3
    seed: int = 0
    chunk: int = 4   # backward residuals of one chunk must fit HBM at 512²
    march_steps: int = 24
    shadow_steps: int = 16
    march_impl: str = "fused"       # fused | mip | exact (RenderConfig)
    march_vectorized: bool = False  # exact impl: step-parallel (fast CPU
    #                                 compile) vs statically unrolled (TPU)
    film_jitter: float = 0.5  # continuous in-pixel film sampling in the
    # OPTIMIZATION loop too — Mitsuba's hdrfilm samples continuous film
    # positions during the inverse optimization (inverse_img_w_mi.py:37-43),
    # and the forward renderer (render/forward.py) uses jitter 0.5, so the
    # optimizer must fit the same estimator (round-2 VERDICT item 4)
    trace_every: int = 1  # re-run the trace pass (marches + sampling
    # decisions) every K epochs and reuse its records in between. The
    # geometry is STATIC across the whole optimization, and the estimator
    # is detached-sampling with RECORDED pdfs — reused records stay a
    # valid importance-sampled estimate of the current radiance because
    # the pdf always matches the draw that produced each direction.
    # Exact in the envmap phase (materials frozen ⇒ records bit-identical;
    # only the NEE CDF goes stale, which is pdf-consistent ⇒ unbiased).
    # In material phases the replayed secondary-bounce rows lag ≤K Adam
    # steps (primary-bounce materials — the dominant term — are always
    # current). K≈8 cuts the march+gather cost of the step by ~K× at
    # matched gradient quality; 1 reproduces the reference's
    # re-trace-every-iteration behavior exactly. Mitsuba/Dr.Jit cannot do
    # this (the megakernel interleaves trace and shade); on TPU the two
    # passes are already separate programs.
    time_budget_s: float = 0.0  # >0: wall-clock deadline for the WHOLE
    # optimization. SaveBest persists continuously, so hitting the
    # deadline degrades gracefully to "best state found so far" (same
    # contract as early stopping); 0 disables. The reference has no
    # equivalent — its only bound is the epoch caps.
    budget_split: bool = True  # with time_budget_s > 0: divide the budget
    # across the PLANNED phase schedule instead of first-come-first-
    # served. The reference protocol (≤5000-epoch phases, early-stopped,
    # inverse_img_w_mi.py:211,222-235) assumes unbounded wall clock; under
    # a finite budget running it verbatim spends everything in the first
    # material phase and the envmap/albedo phases never execute (r5
    # jinjya: 1736 epochs of [rm], 1 env epoch, envmap 12.8 dB). Each
    # phase gets a weighted slice of the REMAINING budget (mat 1.0, env
    # 0.5, reference-quirk 1-epoch env 0.02); a phase that early-stops
    # rolls its leftover into the rest. Off → pure global deadline.
    snapshot_every: int = 500  # flush SaveBest's argmin state to
    # best_results/ every N epochs IN ADDITION to the phase-boundary
    # saves. The device tunnel in this environment can wedge mid-run
    # (r5: two 512² runs hung on a scalar fetch ~40 min in, losing the
    # whole phase's recovery because nothing had been persisted);
    # a periodic flush caps the loss to N epochs. 0 disables.
    compact: bool = True  # wavefront path compaction: probe the scene's
    # per-bounce alive fractions once at startup and drop dead rays
    # between bounces (RenderConfig.compact_caps). Measured fractions on
    # the fixtures leave only 40%/16% (indoor) of secondary lanes live —
    # compaction multiplies every march/gather/shade op by those factors.
    # TPU-only (the span-kernel reorders are TPU kernels; CPU runs are
    # test-scale anyway).


def _render_cfg(opts: InverseOptions) -> RenderConfig:
    return RenderConfig(spp=opts.spp, chunk=min(opts.chunk, opts.spp),
                        use_mesh_normal=opts.use_mesh_normal,
                        march_steps=opts.march_steps,
                        shadow_steps=opts.shadow_steps,
                        march_impl=opts.march_impl,
                        march_vectorized=opts.march_vectorized,
                        film_jitter=opts.film_jitter)


def _apply_mask_constraint(r, m, mask):
    """In-mask roughness/metallic forced to their in-mask means
    (inverse_img_w_mi.py:379-381,509-511)."""
    mask3 = mask[..., None]
    r_mean = jnp.sum(r * mask3) / jnp.maximum(jnp.sum(mask3), 1.0)
    m_mean = jnp.sum(m * mask3) / jnp.maximum(jnp.sum(mask3), 1.0)
    return (jnp.where(mask3, r_mean, r), jnp.where(mask3, m_mean, m))


def _mats_from_dict(mat) -> Materials:
    return Materials(mat["albedo"], mat["roughness"], mat["metallic"],
                     mat["normal"])


def plan_phase_weights(opts: "InverseOptions") -> list:
    """Budget-aware phase schedule (InverseOptions.budget_split): the
    weighted list of phases `optimize` below will actually execute, in
    execution order. Kept in sync with the loop's control flow: loop N
    runs env then materials, the final loop env only; 'a' is skipped in
    loop 1; env in loop 1 is the 1-epoch reference quirk
    (inverse_img_w_mi.py:292-295) unless opt_env_from/opt_src enable it.
    Weights: material 1.0, env 0.5, quirk-env 0.02."""
    def env_weight(ln):
        if ln < opts.opt_env_from or ("rm" not in opts.opt_src
                                      and ln == 1
                                      and opts.opt_src != "skip"):
            return 0.02
        return 0.5

    if opts.opt_src == "skip":
        return [1.0]
    plan = []
    for ln in range(1, opts.max_loops + 1):
        plan.append(env_weight(ln))
        if ln >= opts.max_loops:
            break  # final loop is env-only
        for part in opts.opt_order:
            if part == "a" and ln <= 1:
                continue
            plan.append(1.0)
    return plan


def optimize(gbuf: GBuffer, cam: Camera, mat: dict, output_dir: str,
             opts: InverseOptions) -> dict:
    """Run the full alternating optimization; returns the best state dict.

    ``mat``: jnp arrays — albedo (H,W,3), roughness (H,W,1), metallic
    (H,W,1), normal (H,W,3), gt_image (H,W,3 linear), optional mask (H,W)
    bool, optional gt_envmap (16,32,3).
    """
    os.makedirs(os.path.join(output_dir, "best_results"), exist_ok=True)
    timer = PhaseTimer()
    metrics = JsonlLogger(os.path.join(output_dir, "metrics.jsonl"))
    env_frames_dir = os.path.join(output_dir, "env_frames")
    mat_frames_dir = os.path.join(output_dir, "mat_frames")
    os.makedirs(env_frames_dir, exist_ok=True)
    os.makedirs(mat_frames_dir, exist_ok=True)
    env_frames, mat_frames = [], []

    cfg = _render_cfg(opts)
    env_h, env_w = opts.env_hw
    key = jax.random.PRNGKey(opts.seed)

    if (opts.compact and jax.default_backend() == "tpu"
            and cfg.max_depth > 2):
        from materialist_tpu.render.shader import probe_compact_caps
        caps = probe_compact_caps(
            jax.random.PRNGKey(opts.seed + 99), cfg, cam,
            gbuf, _mats_from_dict(mat), jnp.ones(opts.env_hw + (3,)))
        cfg = cfg._replace(compact_caps=caps)
        print(f"[optimize] wavefront compaction caps: {caps}", flush=True)

    def cap_note(records):
        """Live-count vs compaction-cap readout (ADVICE r4: a saturated
        cap silently drops live rays). Fetched only at print cadence."""
        if not cfg.compact_caps or records is None:
            return ""
        from materialist_tpu.render.shader import compact_cap_utilization
        agg = {}
        for b, f in compact_cap_utilization(records[0]):
            fv = float(f)
            agg[b] = max(agg.get(b, 0.0), fv)
        parts = []
        for b, fv in sorted(agg.items()):
            parts.append(f"b{b}={fv:.2f}")
            if fv >= 0.999:
                print(f"[optimize] WARNING: compaction cap saturated at "
                      f"bounce {b} (util {fv:.3f}) — live rays are being "
                      "dropped; re-probe compact_caps", flush=True)
        return " cap_util[" + ",".join(parts) + "]"

    gt_image = jnp.asarray(mat["gt_image"])
    gt_srgb = linear_to_srgb(gt_image)

    # --- roughness/metallic trust shifts (inverse_img_w_mi.py:183-201)
    r_shift, m_shift = 0.7, 0.05
    if "r" not in opts.opt_src:
        mat["roughness"] = mat["roughness"] * 0 + r_shift
    if "m" not in opts.opt_src:
        mat["metallic"] = mat["metallic"] * 0 + m_shift
    albedo_ori = mat["albedo"]
    roughness_ori = mat["roughness"]
    metallic_ori = mat["metallic"]
    normal_ori = mat["normal"] / jnp.maximum(
        jnp.linalg.norm(mat["normal"], axis=-1, keepdims=True), 1e-9)
    mat["normal"] = normal_ori

    h, w = gt_image.shape[:2]
    n = h * w
    if opts.output_type == "armn":
        start_arm = jnp.concatenate(
            [albedo_ori.reshape(n, 3), roughness_ori.reshape(n, 1),
             metallic_ori.reshape(n, 1), normal_ori.reshape(n, 3)], axis=-1)
    else:
        start_arm = jnp.clip(jnp.concatenate(
            [albedo_ori.reshape(n, 3), roughness_ori.reshape(n, 1),
             metallic_ori.reshape(n, 1)], axis=-1), 0, 1)

    # --- nets
    envmap_net = posmlp.make_envmap_net()
    start_env = jnp.ones((env_h * env_w, 3), jnp.float32)
    env_params = envmap_net.init(jax.random.PRNGKey(1), start_env)["params"]

    brdf_net = posmlp.make_brdf_net(opts.output_type)
    brdf_params = brdf_net.init(jax.random.PRNGKey(2), start_arm)["params"]

    saver = SaveBest()
    early_all = EarlyStopping(patience=2, min_delta=0.025)

    def maybe_snapshot(epoch: int) -> None:
        """Periodic best_results flush (InverseOptions.snapshot_every)."""
        if opts.snapshot_every and epoch > 0 \
                and epoch % opts.snapshot_every == 0:
            saver.save_results(os.path.join(output_dir, "best_results"))

    mask = mat.get("mask")

    # ---------------- jitted phase steps — ONE step implementation
    # (opt/step.py, shared with bench.py): HBM-planned group accumulation
    # + trace/shade split. Every epoch is shade(records)+loss+adjoint+
    # update in one jit; with trace_every == 1 the records are rebuilt
    # every epoch (reference behavior); with K > 1 they are refreshed
    # every K epochs and reused in between (see InverseOptions).
    def _env_of(p):
        return envmap_net.apply({"params": p}, start_env).reshape(
            env_h, env_w, 3)

    def env_maps_of(p, extra):
        return extra, _env_of(p)

    def env_loss_of(maps, img, extra):
        env = maps[1]
        pred = linear_to_srgb(img)
        mse = jnp.mean((pred - gt_srgb) ** 2)
        l1 = jnp.mean(jnp.abs(pred - gt_srgb))
        return mse + l1, (mse, env, img)

    env_phase = make_phase_step(cfg, cam, gbuf, env_maps_of, env_loss_of)
    env_tx_first = schedules.adam_steplr(1e-3)
    env_tx_rest = schedules.adam_plain(1e-4)
    env_steps = {1: env_phase.make_step(env_tx_first)}

    def get_env_step(loop_num):
        if loop_num == 1:
            return env_tx_first, env_steps[1]
        if 2 not in env_steps:
            env_steps[2] = env_phase.make_step(env_tx_rest)
        return env_tx_rest, env_steps[2]

    def material_maps_mlp(p, cur, part):
        """Net-predicted maps for the channels in `part`; all other channels
        stay frozen at the current best (stop-gradient), mirroring the
        reference's per-part assignment (inverse_img_w_mi.py:495-505) — the
        albedo head must not receive render-loss gradients during 'rm'."""
        out = brdf_net.apply({"params": p}, start_arm)
        sg = jax.lax.stop_gradient
        if "a" in part:
            albedo = jnp.clip(out[..., 0:3], 0, 1).reshape(h, w, 3)
        else:
            albedo = sg(cur["albedo"])
        if "r" in part:
            rough = jnp.clip(out[..., 3:4] * 0.93 + 0.07,
                             0, 1).reshape(h, w, 1)
        else:
            rough = sg(cur["roughness"])
        if "m" in part:
            metal = jnp.clip(out[..., 4:5], 0, 1).reshape(h, w, 1)
        else:
            metal = sg(cur["metallic"])
        if opts.output_type == "armn" and "n" in part:
            nrm = out[..., 5:8]
            nrm = (nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1,
                                                     keepdims=True), 1e-9)
                   ).reshape(h, w, 3)
        else:
            nrm = sg(cur["normal"])
        return albedo, rough, metal, nrm

    def _constrained_mats(maps):
        albedo, rough, metal, nrm = maps
        if opts.use_mask and mask is not None:
            rough, metal = _apply_mask_constraint(rough, metal, mask)
        return Materials(albedo, rough, metal, nrm)

    def make_mat_loss_of(part):
        def loss_of(maps, img, extra):
            mats = maps[0]
            albedo, rough, metal, nrm = mats
            ratio = jnp.mean(gt_image) / jnp.maximum(
                jax.lax.stop_gradient(jnp.mean(img)), 1e-9)
            pred = linear_to_srgb(img * ratio)
            mse = jnp.mean((pred - gt_srgb) ** 2)
            l1 = jnp.mean(jnp.abs(pred - gt_srgb))
            aux = 0.0
            if "a" in part:
                aux += jnp.mean(jnp.abs(albedo - albedo_ori))
            if "r" in part:
                aux += jnp.mean(jnp.abs(rough - roughness_ori))
            if "m" in part:
                aux += jnp.mean(jnp.abs(metal - metallic_ori))
            if "n" in part and not opts.use_mesh_normal:
                aux += jnp.mean(jnp.abs(nrm - normal_ori))
            scale_ratio = jax.lax.stop_gradient(
                l1 / jnp.maximum(mse, 1e-12))
            render_loss = 3.0 * scale_ratio * mse + l1
            loss = render_loss + aux * opts.scale_delta
            return loss, (mse, render_loss, aux, mats, pred)
        return loss_of

    # phase-step cache: the jitted programs depend only on (kind, part),
    # not on the outer loop — `extra` carries the per-loop inputs (current
    # best maps + frozen envmap) so loops 2/3 reuse loop 1's compilation
    mat_phases = {}

    def get_mat_phase(kind, part):
        key_ = (kind, part)
        if key_ in mat_phases:
            return mat_phases[key_]
        if kind == "mlp":
            def maps_of(p, extra):
                cur, envmap = extra
                return (_constrained_mats(material_maps_mlp(p, cur, part)),
                        envmap)
            tx = schedules.adamw_steplr(3e-4, floor=1.5e-4)
        else:
            def clamp_maps(params, cur):
                albedo = (jnp.clip(params["albedo"], 0, 1)
                          if "a" in part else cur["albedo"])
                rough = (jnp.clip(params["roughness"], 0.07, 1)
                         if "r" in part else cur["roughness"])
                metal = (jnp.clip(params["metallic"], 0, 1)
                         if "m" in part else cur["metallic"])
                if "n" in part and not opts.use_mesh_normal:
                    nr = params["normal"]
                    nrm = nr / jnp.maximum(
                        jnp.linalg.norm(nr, axis=-1, keepdims=True), 1e-9)
                else:
                    nrm = cur["normal"]
                return albedo, rough, metal, nrm

            def maps_of(params, extra):
                cur, envmap = extra
                return _constrained_mats(clamp_maps(params, cur)), envmap
            tx = schedules.adam_steplr(3e-4, floor=1.5e-4)

        phase = make_phase_step(cfg, cam, gbuf, maps_of,
                                make_mat_loss_of(part))
        entry = (phase, phase.make_step(tx), tx)
        mat_phases[key_] = entry
        return entry

    # ---------------- frame helpers (host side)
    def save_env_frame(env_np, pred_srgb_np, loop_num, epoch):
        image_io.write(os.path.join(output_dir, "env.png"),
                       np.clip(env_np, 0, 1), linear_input=False)
        gt_np = np.asarray(gt_srgb)
        canvas = np.zeros_like(gt_np)
        dh = min(env_np.shape[0] * 3, canvas.shape[0] // 2)
        dw = int(dh * env_np.shape[1] / env_np.shape[0])
        env_big = image_io.resize_bilinear_align_corners(env_np, (dh, dw))
        y0 = (canvas.shape[0] - dh) // 2
        x0 = (canvas.shape[1] - dw) // 2
        canvas[y0:y0 + dh, x0:x0 + dw] = np.clip(env_big, 0, 1)
        frame = np.concatenate([gt_np, np.clip(pred_srgb_np, 0, 1), canvas],
                               axis=1)
        p = os.path.join(env_frames_dir,
                         f"opt_env_frame_{loop_num}_{epoch:04d}.png")
        image_io.write(p, frame, linear_input=False)
        env_frames.append(p)
        return frame

    def save_mat_frame(mats: Materials, pred_srgb_np, loop_num, part, epoch):
        tiles = [np.asarray(gt_srgb), np.clip(pred_srgb_np, 0, 1),
                 np.asarray(mats.albedo),
                 np.repeat(np.asarray(mats.roughness), 3, -1),
                 np.repeat(np.asarray(mats.metallic), 3, -1),
                 np.asarray(mats.normal) * 0.5 + 0.5]
        row1 = np.concatenate(tiles[:3], axis=1)
        row2 = np.concatenate(tiles[3:], axis=1)
        frame = np.clip(np.concatenate([row1, row2], axis=0), 0, 1)
        p = os.path.join(mat_frames_dir,
                         f"mat_frame_{loop_num}_{part}_{epoch:04d}.png")
        image_io.write(p, frame, linear_input=False)
        mat_frames.append(p)

    # ---------------- outer alternation (inverse_img_w_mi.py:223-599)
    # The reference iterates `while loop_num <= 10` but breaks after the
    # 3rd envmap phase (inverse_img_w_mi.py:223,309-310): loop N runs env,
    # then materials, and the final loop runs env only.
    loop_num = 0
    last_env_frame = None
    final_envmap = None
    deadline = (time.time() + opts.time_budget_s
                if opts.time_budget_s > 0 else None)

    def out_of_time():
        return deadline is not None and time.time() > deadline

    phase_plan = (plan_phase_weights(opts)
                  if deadline is not None and opts.budget_split else [])
    phase_deadline = deadline

    def begin_phase(label):
        nonlocal phase_deadline
        if deadline is None or not phase_plan:
            phase_deadline = deadline
            return
        w = phase_plan.pop(0)
        rem = deadline - time.time()
        if rem <= 0:
            phase_deadline = deadline
            return
        slice_s = rem * w / (w + sum(phase_plan))
        phase_deadline = time.time() + slice_s
        if w >= 0.1:
            print(f"[budget] {label}: {slice_s:.0f}s of {rem:.0f}s "
                  "remaining", flush=True)

    def phase_over():
        return (phase_deadline is not None
                and time.time() > phase_deadline) or out_of_time()

    while True:
        loop_num += 1
        # ---- envmap phase
        env_tx, env_step = get_env_step(loop_num)
        begin_phase(f"env {loop_num}")
        opt_state = env_tx.init(env_params)
        patience = 500 if opts.opt_src == "skip" else 100
        early = EarlyStopping(patience=patience, min_delta=0.01)
        mats_now = _mats_from_dict(mat)
        mse_val = float("nan")
        records, k_tr = None, None
        for epoch in range(opts.num_epochs):
            if records is None or epoch % opts.trace_every == 0:
                records = None  # free before re-trace: no double residency
                k_tr = jax.random.fold_in(key, loop_num * 1000000 + epoch)
                with timer.phase("env_trace"):
                    records = env_phase.trace_all(env_params, mats_now,
                                                  k_tr)
            with timer.phase("env_step"):
                env_params, opt_state, loss, aux, _ = env_step(
                    env_params, opt_state, mats_now, *records)
                mse, env, img = aux
                mse_val = float(mse)
            metrics.log(phase="env", loop=loop_num, epoch=epoch,
                        mse=mse_val)
            saver.update(mse_val, mat["albedo"], mat["roughness"],
                         mat["metallic"], mat["normal"], env, img)
            early(mse_val)
            maybe_snapshot(epoch)
            if epoch % 50 == 0 or early.early_stop:
                print(f"[env {loop_num}] epoch {epoch} loss {float(loss):.4f}"
                      f" mse {mse_val:.4f}" + cap_note(records), flush=True)
            if opts.frame_every and (epoch % opts.frame_every == 0
                                     or early.early_stop):
                pred_np = np.asarray(linear_to_srgb(img))
                last_env_frame = save_env_frame(np.asarray(env), pred_np,
                                                loop_num, epoch)
            if early.early_stop:
                print("Early stopping", flush=True)
                break
            if phase_over():
                print("[env] phase budget exhausted", flush=True)
                break
            if loop_num < opts.opt_env_from:
                break
            if "rm" not in opts.opt_src and loop_num == 1 \
                    and opts.opt_src != "skip":
                break

        final_envmap = saver.best["envmap"]
        if final_envmap is not None:
            image_io.write(os.path.join(output_dir, "final_envmap.hdr"),
                           np.asarray(final_envmap))
        if last_env_frame is not None:
            image_io.write(os.path.join(output_dir, "opt_env_img.png"),
                           last_env_frame, linear_input=False)
        if loop_num >= opts.opt_env_from:
            saver.save_results(os.path.join(output_dir, "best_results"))
        early_all(mse_val)
        if early_all.early_stop:
            print("Global early stopping", flush=True)
            break
        if loop_num >= opts.max_loops or opts.opt_src == "skip":
            break
        if out_of_time():
            print("[loop] time budget exhausted", flush=True)
            break

        # ---- material phase
        if loop_num < opts.opt_env_from and loop_num == 1:
            if mat.get("gt_envmap") is not None:
                env4render = jnp.asarray(mat["gt_envmap"])
                print("use gt envmap for brdf optimization")
            else:
                env4render = jnp.ones((env_h, env_w, 3), jnp.float32)
                print("Use envmap = 1 for brdf optimization")
        else:
            env4render = jnp.asarray(final_envmap)
            print("Use optimized envmap for brdf optimization")

        if loop_num <= 1:
            if "r" not in opts.opt_src:
                mat["roughness"] = mat["roughness"] * 0 + r_shift
            if "m" not in opts.opt_src:
                mat["metallic"] = mat["metallic"] * 0 + m_shift

        for part in opts.opt_order:
            if part == "a" and loop_num <= 1:
                continue
            if out_of_time():
                print(f"[mat {part}] time budget exhausted", flush=True)
                break
            patience = max(200 // loop_num, 1)
            delta = 0.005 if "a" in part else 0.001
            early = EarlyStopping(patience=patience, min_delta=delta)
            begin_phase(f"mat {part} {loop_num}")

            if opts.model_name == "none":
                params = {}
                if "a" in part:
                    params["albedo"] = mat["albedo"]
                if "r" in part:
                    params["roughness"] = mat["roughness"]
                if "m" in part:
                    params["metallic"] = mat["metallic"]
                if "n" in part and not opts.use_mesh_normal:
                    params["normal"] = mat["normal"]
                cur = {k2: mat[k2] for k2 in
                       ("albedo", "roughness", "metallic", "normal")}
                phase, step, tx = get_mat_phase("direct", part)
                extra = (cur, env4render)
                opt_state = tx.init(params)
                records, k_tr = None, None
                for epoch in range(opts.num_epochs):
                    if records is None or epoch % opts.trace_every == 0:
                        records = None  # free before re-trace
                        k_tr = jax.random.fold_in(
                            key, loop_num * 1000000 + 500000 + epoch)
                        with timer.phase(f"mat_trace[{part}]"):
                            records = phase.trace_all(params, extra, k_tr)
                    with timer.phase(f"mat_direct[{part}]"):
                        params, opt_state, loss, auxes, _ = step(
                            params, opt_state, extra, *records)
                        mse, render_loss, aux, mats_cur, pred = auxes
                        mse_val = float(mse)
                    metrics.log(phase=f"mat_direct[{part}]", loop=loop_num,
                                epoch=epoch, mse=mse_val)
                    saver.update(mse_val, mats_cur.albedo,
                                 mats_cur.roughness, mats_cur.metallic,
                                 mats_cur.normal, env4render, pred)
                    early(mse_val)
                    maybe_snapshot(epoch)
                    if epoch % 50 == 0 or early.early_stop:
                        print(f"[mat-direct {loop_num}/{part}] epoch {epoch} "
                              f"loss {float(loss):.4f} mse {mse_val:.4f}"
                              + cap_note(records), flush=True)
                    if opts.frame_every and (epoch % opts.frame_every == 0
                                             or early.early_stop):
                        save_mat_frame(mats_cur, np.asarray(pred), loop_num,
                                       part, epoch)
                    if early.early_stop:
                        print("Early stopping", flush=True)
                        break
                    if phase_over():
                        print("[mat] phase budget exhausted", flush=True)
                        break
            else:
                phase, step, tx = get_mat_phase("mlp", part)
                opt_state = tx.init(brdf_params)
                cur = {k2: mat[k2] for k2 in
                       ("albedo", "roughness", "metallic", "normal")}
                extra = (cur, env4render)
                records, k_tr = None, None
                for epoch in range(opts.num_epochs):
                    if records is None or epoch % opts.trace_every == 0:
                        records = None  # free before re-trace
                        k_tr = jax.random.fold_in(
                            key, loop_num * 1000000 + 500000 + epoch)
                        with timer.phase(f"mat_trace[{part}]"):
                            records = phase.trace_all(brdf_params, extra,
                                                      k_tr)
                    with timer.phase(f"mat_mlp[{part}]"):
                        brdf_params, opt_state, loss, auxes, params_pre = \
                            step(brdf_params, opt_state, extra, *records)
                        mse, render_loss, aux, mats_cur, pred = auxes
                        mse_val = float(mse)
                    metrics.log(phase=f"mat_mlp[{part}]", loop=loop_num,
                                epoch=epoch, mse=mse_val)
                    saver.update(mse_val, mats_cur.albedo,
                                 mats_cur.roughness, mats_cur.metallic,
                                 mats_cur.normal, env4render, pred,
                                 net_params=params_pre)
                    early(mse_val)
                    maybe_snapshot(epoch)
                    if epoch % 50 == 0 or early.early_stop:
                        print(f"[mat-mlp {loop_num}/{part}] epoch {epoch} "
                              f"loss {float(loss):.4f} mse {mse_val:.4f}"
                              + cap_note(records), flush=True)
                    if opts.frame_every and (epoch % opts.frame_every == 0
                                             or early.early_stop):
                        save_mat_frame(mats_cur, np.asarray(pred), loop_num,
                                       part, epoch)
                    if early.early_stop:
                        print("Early stopping", flush=True)
                        break
                    if phase_over():
                        print("[mat] phase budget exhausted", flush=True)
                        break

            # restore best (inverse_img_w_mi.py:460-463,583-588): both the
            # maps and — in the MLP path — the argmin network weights, so
            # subsequent phases resume from the best state rather than the
            # last post-early-stop one
            for k2 in ("albedo", "roughness", "metallic", "normal"):
                if saver.best[k2] is not None:
                    mat[k2] = saver.best[k2]
            if opts.model_name != "none" and saver.best_net_params is not None:
                brdf_params = saver.best_net_params
            saver.save_results(os.path.join(output_dir, "best_results"))

    print("[profile] per-phase wall clock:\n" + timer.report(),
          flush=True)
    metrics.close()
    if env_frames:
        video_io.write_video(env_frames,
                             os.path.join(output_dir,
                                          "env_optimization.mp4"), fps=10)
    if mat_frames:
        video_io.write_video(mat_frames,
                             os.path.join(output_dir,
                                          "mat_optimization.mp4"), fps=10)
    return saver.get_best()
