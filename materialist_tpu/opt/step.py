"""THE inverse-step implementation — one code path for the production
loop (opt/loop.py), the CLI (cli/inverse.py) and the benchmark (bench.py).

Round-3 verdict item 2: the HBM-aware planning (opt/plan.py) and the
gradient accumulation over sample groups (the lax.scan formulation of
opt/accum.py) lived only in bench.py, so the user-facing pipeline could
not run the 1024²×64spp north-star workload. This module packages the
step so every caller gets the same program:

    plan   = plan_step(res, spp)                 (HBM byte model)
    recs   = scan_g trace(maps, key_g)           (non-differentiable)
    img    = mean_g shade(maps, recs_g, key_g)   (forward scan)
    loss   = loss_of(maps, img)
    grads  = ∂maps-chain: scan_g vjp(shade)(ct/G) + direct loss→maps ct,
             pulled back through maps_of (the phase's net/clamp mapping)

The scan over groups keeps one group's shade-vjp working set resident at
a time (scan semantics are sequential), exactly like bench.py's round-3
hand-wired accumulation; with plan.groups == 1 the program degenerates to
the single-group step the loop always ran.

Reference anchor: the step body replaces one iteration of
``optimize_envmap_ARMN`` (inverse_img_w_mi.py:236-254,513-545) — render
fwd + adjoint + loss; the optax update rides in ``make_step``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from materialist_tpu.opt.plan import StepPlan, plan_step
from materialist_tpu.render.shader import (RenderConfig,
                                           shade_from_records,
                                           trace_step_records)


class PhaseStep(NamedTuple):
    """Jitted pieces of one optimization phase (env / material part).

    ``maps_of(params, extra) -> (Materials, envmap)`` is the phase's
    differentiable parameterization (PosMLP apply, direct clamps, or
    identity); ``extra`` is a pytree of non-differentiable inputs that
    change across phases/loops (current best maps, frozen envmap) so the
    jitted program is reused instead of recompiled per outer loop.
    ``loss_of((mats, env), img, extra) -> (loss, aux)``.
    """
    cfg: RenderConfig          # per-group render config (spp = spp/G)
    plan: StepPlan
    n_groups: int
    trace_all: Callable        # (params, extra, key) -> (records, keys)
    value_and_grad: Callable   # (params, extra, (records, keys))
    #                            -> (loss, aux, grads)
    make_step: Callable        # (optax tx) -> jitted full step


def make_phase_step(cfg_full: RenderConfig, cam, gbuf, maps_of: Callable,
                    loss_of: Callable, *, plan: StepPlan = None,
                    donate_records: bool = False) -> PhaseStep:
    """Build the unified phase step for a film of gbuf's resolution.

    ``cfg_full.spp`` is the TOTAL spp of the step; the plan splits it
    into ``groups`` sequentially-accumulated shade groups and bounds the
    trace chunk (opt/plan.py byte model). All other cfg fields pass
    through unchanged.
    """
    h, w = gbuf.dist.shape
    if plan is None:
        caps = cfg_full.compact_caps
        bounces = max(cfg_full.max_depth - 1, 1)
        # bounce 0 is uncompacted (frac 1); bounces beyond len(caps) reuse
        # the last cap (shader _caps_abs semantics) — count them too, or
        # the HBM plan goes optimistic for max_depth > len(caps)+2
        if caps:
            vert_frac = (1.0 + sum(caps[min(i, len(caps) - 1)]
                                   for i in range(bounces - 1))) / bounces
        else:
            vert_frac = 1.0
        plan = plan_step(max(h, w), cfg_full.spp, max_chunk=cfg_full.chunk,
                         bounces=bounces, vert_frac=vert_frac)
    n_groups = max(min(plan.groups, cfg_full.spp), 1)
    spp_group = max(cfg_full.spp // n_groups, 1)
    cfg = cfg_full._replace(
        spp=spp_group,
        chunk=max(min(plan.chunk, cfg_full.chunk, spp_group), 1),
        replay_blob=plan.replay_blob and cfg_full.replay_blob)

    def _trace(maps, key):
        mats, env = maps
        return trace_step_records(key, cfg, cam, gbuf, mats, env)

    def _shade(maps, recs, key):
        mats, env = maps
        return shade_from_records(key, recs, cfg, cam, gbuf, mats, env)

    @jax.jit
    def trace_all(params, extra, key):
        maps = jax.lax.stop_gradient(maps_of(params, extra))
        keys = jax.random.split(key, n_groups)

        def body(carry, k):
            return carry, _trace(maps, k)

        _, recs = jax.lax.scan(body, 0, keys)
        return recs, keys

    def _vg(params, extra, recs, keys):
        maps, pull_maps = jax.vjp(lambda p: maps_of(p, extra), params)

        def fwd(carry, xs):
            r, k = xs
            return carry, _shade(maps, r, k)

        _, imgs = jax.lax.scan(fwd, 0, (recs, keys))
        img = jnp.mean(imgs, axis=0)

        def lfn(m, i):
            return loss_of(m, i, extra)

        (loss, aux), (ct_maps, ct_img) = jax.value_and_grad(
            lfn, argnums=(0, 1), has_aux=True)(maps, img)
        ct_img = jax.tree.map(lambda x: x / n_groups, ct_img)

        def bwd(gacc, xs):
            r, k = xs
            _, pull = jax.vjp(lambda m: _shade(m, r, k), maps)
            g = pull(ct_img)[0]
            return jax.tree.map(jnp.add, gacc, g), None

        g0 = jax.tree.map(jnp.zeros_like, maps)
        g_maps, _ = jax.lax.scan(bwd, g0, (recs, keys))
        g_maps = jax.tree.map(jnp.add, g_maps, ct_maps)
        grads = pull_maps(g_maps)[0]
        return loss, aux, grads

    vg_j = jax.jit(_vg)

    def value_and_grad(params, extra, records):
        recs, keys = records
        return vg_j(params, extra, recs, keys)

    def make_step(tx):
        import optax

        @jax.jit
        def step(params, opt_state, extra, recs, keys):
            loss, aux, grads = _vg(params, extra, recs, keys)
            updates, opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # params (pre-update) matches the returned loss/aux — SaveBest
            # records it, not new_params (one step stale otherwise)
            return new_params, opt_state, loss, aux, params
        return step

    return PhaseStep(cfg=cfg, plan=plan, n_groups=n_groups,
                     trace_all=trace_all, value_and_grad=value_and_grad,
                     make_step=make_step)
