"""Inverse-optimization loop tests: synthetic-scene convergence and the
reference's phase-gating quirks (SURVEY.md §2.1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.opt.callbacks import EarlyStopping
from materialist_tpu.opt.loop import InverseOptions, optimize
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import RenderConfig, render

pytestmark = pytest.mark.slow  # golden/convergence runs: minutes on CPU


@pytest.fixture(scope="module")
def synthetic():
    h = w = 32
    cam = Camera(h, w)
    key = jax.random.PRNGKey(0)
    depth = 2.0 + 0.3 * jax.random.uniform(key, (h, w))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    env_top = jnp.ones((8, 32, 3)) * jnp.array([2.0, 1.5, 1.0])
    env = jnp.concatenate([env_top, jnp.ones((8, 32, 3)) * 0.2], axis=0)
    true_mats = Materials(
        albedo=jnp.broadcast_to(jnp.array([0.7, 0.3, 0.2]), (h, w, 3)),
        roughness=jnp.full((h, w, 1), 0.5),
        metallic=jnp.full((h, w, 1), 0.1),
        normal=gbuf.normal_geo)
    cfg = RenderConfig(spp=32, chunk=8, march_steps=8, shadow_steps=8,
                       march_impl="exact", march_vectorized=True)
    gt = render(jax.random.PRNGKey(42), cfg, cam, gbuf, true_mats, env)
    return cam, gbuf, true_mats, env, gt


def test_envmap_phase_converges(synthetic, tmp_path):
    """opt_src='skip' runs the envmap phase only; the loss must drop and
    the recovered envmap must correlate with the (vertically asymmetric)
    ground truth."""
    cam, gbuf, true_mats, env, gt = synthetic
    mat = {"albedo": true_mats.albedo, "roughness": true_mats.roughness,
           "metallic": true_mats.metallic, "normal": true_mats.normal,
           "gt_image": gt}
    opts = InverseOptions(opt_src="skip", opt_order=("skip",), spp=8,
                          chunk=8, num_epochs=40, frame_every=0,
                          march_steps=8, shadow_steps=8,
                          march_impl="exact", march_vectorized=True)
    best = optimize(gbuf, cam, mat, str(tmp_path), opts)
    env_rec = np.asarray(best["envmap"])
    # top hemisphere brighter than bottom, like the GT
    assert env_rec[:8].mean() > 1.2 * env_rec[8:].mean()
    # red channel dominates blue in the top rows (GT is [2, 1.5, 1])
    assert env_rec[:8, :, 0].mean() > env_rec[:8, :, 2].mean()


def test_material_phase_improves_albedo(synthetic, tmp_path):
    """'rm a' ordering with known envmap: albedo error must shrink."""
    cam, gbuf, true_mats, env, gt = synthetic
    key = jax.random.PRNGKey(5)
    bad_albedo = jnp.clip(
        true_mats.albedo + 0.25 * jax.random.normal(key, (32, 32, 3)), 0, 1)
    mat = {"albedo": bad_albedo, "roughness": true_mats.roughness,
           "metallic": true_mats.metallic, "normal": true_mats.normal,
           "gt_image": gt, "gt_envmap": env}
    err0 = float(jnp.abs(bad_albedo - true_mats.albedo).mean())
    # max_loops=3: the 'a' part is skipped in loop 1 and the final loop
    # runs env-only (inverse_img_w_mi.py:344,309-310), so materials train
    # in loop 2.
    opts = InverseOptions(opt_src="a", opt_order=("a",),
                          model_name="none", spp=8, chunk=8,
                          num_epochs=30, frame_every=0, max_loops=3,
                          march_steps=8, shadow_steps=8,
                          march_impl="exact", march_vectorized=True)
    best = optimize(gbuf, cam, mat, str(tmp_path), opts)
    err1 = float(jnp.abs(jnp.asarray(best["albedo"])
                         - true_mats.albedo).mean())
    assert err1 < err0, (err0, err1)
    # layout contract: best_results populated
    for f in ("albedo.exr", "envmap.hdr", "rendered_img.exr"):
        assert os.path.exists(os.path.join(str(tmp_path), "best_results",
                                           f))


def test_trace_reuse_matches_per_epoch_trace(synthetic, tmp_path):
    """trace_every=4 (records reused across epochs) must recover the
    albedo about as well as re-tracing every epoch: the reused records
    stay a valid detached-sampling estimate (pdfs are recorded with the
    draws), so only ≤K-step staleness of the secondary-bounce replay
    distinguishes the two runs."""
    cam, gbuf, true_mats, env, gt = synthetic
    key = jax.random.PRNGKey(5)
    bad_albedo = jnp.clip(
        true_mats.albedo + 0.25 * jax.random.normal(key, (32, 32, 3)), 0, 1)
    mat = {"albedo": bad_albedo, "roughness": true_mats.roughness,
           "metallic": true_mats.metallic, "normal": true_mats.normal,
           "gt_image": gt, "gt_envmap": env}
    err0 = float(jnp.abs(bad_albedo - true_mats.albedo).mean())

    def run(k_trace, out):
        opts = InverseOptions(opt_src="a", opt_order=("a",),
                              model_name="none", spp=8, chunk=8,
                              num_epochs=30, frame_every=0, max_loops=3,
                              march_steps=8, shadow_steps=8,
                              march_impl="exact", march_vectorized=True,
                              trace_every=k_trace)
        best = optimize(gbuf, cam, mat, str(tmp_path / out), opts)
        return float(jnp.abs(jnp.asarray(best["albedo"])
                             - true_mats.albedo).mean())

    err_fresh = run(1, "fresh")
    err_reuse = run(4, "reuse")
    assert err_reuse < err0, (err0, err_reuse)
    # within 25% of the fresh-trace recovery error (same budget)
    assert err_reuse < err_fresh * 1.25 + 0.01, (err_fresh, err_reuse)
    # K=8 (the bench/production amortization design point,
    # InverseOptions.trace_every docstring): same-budget recovery must
    # stay within 35% of fresh-trace — secondary-row staleness grows
    # with K, so the tolerance is looser than K=4's
    err_reuse8 = run(8, "reuse8")
    assert err_reuse8 < err0, (err0, err_reuse8)
    assert err_reuse8 < err_fresh * 1.35 + 0.01, (err_fresh, err_reuse8)


def test_early_stopping_semantics():
    es = EarlyStopping(patience=2, min_delta=0.1)
    assert not es(1.0)
    assert not es(0.5)     # improvement resets
    assert not es(0.48)    # <10% improvement → counter 1
    assert es(0.47)        # counter 2 → stop


def test_time_budget_stops_and_returns_best(synthetic, tmp_path):
    """time_budget_s=0-ish must stop the optimization after at most a few
    epochs while still returning a complete SaveBest state (the deadline
    degrades to 'best found so far', InverseOptions.time_budget_s)."""
    cam, gbuf, true_mats, env, gt = synthetic
    mat = {"albedo": true_mats.albedo, "roughness": true_mats.roughness,
           "metallic": true_mats.metallic, "normal": true_mats.normal,
           "gt_image": gt}
    opts = InverseOptions(opt_src="skip", opt_order=("skip",), spp=8,
                          chunk=8, num_epochs=5000, frame_every=0,
                          march_steps=8, shadow_steps=8,
                          march_impl="exact", march_vectorized=True,
                          time_budget_s=1e-3)
    best = optimize(gbuf, cam, mat, str(tmp_path), opts)
    assert best["envmap"] is not None
    assert np.isfinite(best["loss"])
    assert os.path.exists(os.path.join(str(tmp_path), "best_results",
                                       "envmap.hdr"))


def test_trace_reuse_equal_wall_clock(synthetic, tmp_path):
    """Equal-WALL-CLOCK amortization evidence (round-3 verdict item 7 /
    advice): K=8 for N epochs must recover at least as well as K=1 for
    the number of epochs the same wall-clock buys it.

    Cost model from the measured r4 step (512²×16spp, TPU): one trace
    pass ≈ 0.33 of a fresh step, so an amortized (K=8) step costs
    ≈ 1 − 0.33·7/8 ≈ 0.71 of a fresh one — at equal time, K=1 runs
    ⌈0.71·N⌉ epochs to K=8's N. Aggregated over two seeds to keep the
    MC comparison stable.
    """
    cam, gbuf, true_mats, env, gt = synthetic
    N = 32
    N_fresh = int(round(0.71 * N))

    def run(k_trace, epochs, seed, out):
        key = jax.random.PRNGKey(seed)
        bad_albedo = jnp.clip(
            true_mats.albedo + 0.25 * jax.random.normal(key, (32, 32, 3)),
            0, 1)
        mat = {"albedo": bad_albedo, "roughness": true_mats.roughness,
               "metallic": true_mats.metallic, "normal": true_mats.normal,
               "gt_image": gt, "gt_envmap": env}
        opts = InverseOptions(opt_src="a", opt_order=("a",),
                              model_name="none", spp=8, chunk=8,
                              num_epochs=epochs, frame_every=0,
                              max_loops=3, march_steps=8, shadow_steps=8,
                              march_impl="exact", march_vectorized=True,
                              trace_every=k_trace, seed=seed)
        best = optimize(gbuf, cam, mat, str(tmp_path / out), opts)
        return float(jnp.abs(jnp.asarray(best["albedo"])
                             - true_mats.albedo).mean())

    err8 = sum(run(8, N, s, f"k8_{s}") for s in (5, 11))
    err1 = sum(run(1, N_fresh, s, f"k1_{s}") for s in (5, 11))
    # K=8 must WIN (or tie within 10%) at equal wall-clock — this is the
    # claim that justifies the production/bench amortization default
    assert err8 < err1 * 1.10 + 0.01, (err8, err1)


def test_plan_phase_weights_schedules():
    """Budget-split schedule enumeration matches the loop's control flow
    (InverseOptions.budget_split)."""
    from materialist_tpu.opt.loop import plan_phase_weights

    # indoor/jinjya shape: opt_src='a', opt_order=(rm, a), env from 2,
    # 3 loops: quirk-env, rm | env, rm, a | env
    opts = InverseOptions(opt_src="a", opt_order=("rm", "a"),
                          opt_env_from=2, max_loops=3)
    assert plan_phase_weights(opts) == [0.02, 1.0, 0.5, 1.0, 1.0, 0.5]

    # env-only mode
    assert plan_phase_weights(InverseOptions(opt_src="skip")) == [1.0]

    # opt_src with rm: loop-1 env runs fully
    opts = InverseOptions(opt_src="rm", opt_order=("rm",),
                          opt_env_from=0, max_loops=2)
    assert plan_phase_weights(opts) == [0.5, 1.0, 0.5]


def test_budget_split_reaches_env_phase(synthetic, tmp_path):
    """With a finite time budget the slicer must not let the first
    material phase starve the rest of the schedule: loop-2's env phase
    must execute (the r5 jinjya failure mode: 1736 [rm] epochs, 1 env
    epoch, envmap never optimized)."""
    cam, gbuf, true_mats, env, gt = synthetic
    mat = {"albedo": true_mats.albedo, "roughness": true_mats.roughness,
           "metallic": true_mats.metallic, "normal": true_mats.normal,
           "gt_image": gt}
    out = str(tmp_path / "budget")
    opts = InverseOptions(opt_src="a", opt_order=("rm", "a"),
                          model_name="none", opt_env_from=2, spp=8,
                          chunk=8, num_epochs=10 ** 6, frame_every=0,
                          max_loops=3, time_budget_s=150.0,
                          march_steps=8, shadow_steps=8,
                          march_impl="exact", march_vectorized=True,
                          snapshot_every=0)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        optimize(gbuf, cam, mat, out, opts)
    log = buf.getvalue()
    # the unbounded-epoch rm phase must have been cut by its slice...
    assert "[mat] phase budget exhausted" in log, log[-2000:]
    # ...and the loop-2 env phase must have actually run
    assert "[budget] env 2" in log, log[-2000:]
