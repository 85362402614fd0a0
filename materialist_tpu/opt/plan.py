"""HBM-aware step planning: choose (groups, chunk, replay_blob,
keep_records) for an inverse step at a given (res, spp) instead of
hand-tuned env vars per resolution (VERDICT r2 weak #5).

The model is deliberately coarse — byte counts of the dominant residents
with a headroom factor — because the goal is robustness across the
resolution/spp axis, not percent-accurate accounting:

* trace records: per path-vertex, ``REPLAY_REC_BYTES`` when the bf16
  material rows ride the records (RenderConfig.replay_blob — shade never
  re-gathers) or ``LIGHT_REC_BYTES`` when the shade pass re-fetches rows
  through the differentiable span-binned gather (ops/pallas/rowops.py).
  Cached across the accumulation (opt/accum.py keep_records=True) they
  are resident for the WHOLE step; in re-trace mode only one group's.
* shade-vjp working set: proportional to one group's path-vertices —
  the checkpointed shade recompute plus its cotangents.
* trace working set: proportional to one chunk's rays (march state,
  envmap sampling); bounded by choosing the chunk.

Calibration (v5e, 16 GB HBM, measured round 3): 1024²×64 spp fits as
groups=4, chunk=8, replay_blob=False, keep_records=True; the same step
with replay records cached OOMs. 512²×64 fits single-group with replay.
"""

from __future__ import annotations

from typing import NamedTuple

# bytes per path-vertex of trace records (render/shader.py
# trace_step_records: shadowed/hit flags, hit idx, NEE dir+pdfs, lobe dir
# — plus the bf16 material blob + normal rows in replay mode)
# r5 record slimming (shader.py _trace_chunk_paths): fused replay blob
# carries only the 5 consumed channels (−6 B), the shade normal rides
# f16 instead of f32 (−6 B) and the wo plane is derived from the
# previous bounce's win record instead of stored (−6 B)
REPLAY_REC_BYTES = 66.0   # r4: 84
LIGHT_REC_BYTES = 42.0    # r4: 54 (normal + wo slimming applies too)
# bytes per path-vertex of the shade pass's vjp working set (f32 lobe /
# NEE evaluation state + cotangents, checkpoint-recomputed per group)
SHADE_VJP_BYTES = 192.0   # r4: fused-kernel ins/outs + cots
# + sort/scatter temporaries measured closer to ~180 B/vertex
# bytes per primary ray of the trace pass's in-flight state per chunk
TRACE_CHUNK_BYTES = 320.0

HBM_BYTES_V5E = 16 * 1024 ** 3
HEADROOM = 0.50          # fraction of HBM the planned residents may use
# (r4: 0.60 with replay records OOM'd the 1024^2 x 64spp step on v5e —
# the model omits compaction temporaries and allocator fragmentation)


class StepPlan(NamedTuple):
    groups: int
    chunk: int
    replay_blob: bool
    keep_records: bool


def plan_step(res: int, spp: int, hbm_bytes: int = HBM_BYTES_V5E,
              bounces: int = 3, max_chunk: int = 8,
              vert_frac: float = 1.0) -> StepPlan:
    """Pick accumulation/record settings that fit ``hbm_bytes``.

    Preference order (fastest first):
    1. replay records cached across the accumulation (no re-gather, no
       re-trace);
    2. record-light cached (differentiable re-gather in shade);
    3. record-light re-traced per group (trace runs twice — last resort).
    """
    budget = hbm_bytes * HEADROOM
    n_px = res * res
    # vert_frac < 1: wavefront compaction (RenderConfig.compact_caps)
    # shrinks every secondary bounce's records/working set to the live
    # fraction — (1 + Σcaps)/bounces of the uncompacted vertex count
    verts_total = float(n_px) * spp * bounces * vert_frac

    # groups: bound one group's shade-vjp working set to half the budget
    groups = 1
    while (verts_total / groups) * SHADE_VJP_BYTES > 0.5 * budget \
            and groups < spp:
        groups *= 2
    spp_group = max(spp // groups, 1)
    chunk = min(max_chunk, spp_group)
    # chunk: bound the trace pass's in-flight ray state
    while float(n_px) * chunk * TRACE_CHUNK_BYTES > 0.5 * budget \
            and chunk > 1:
        chunk //= 2

    def fits(rec_bytes, cached, g):
        rec = verts_total * rec_bytes if cached \
            else (verts_total / g) * rec_bytes
        return rec + (verts_total / g) * SHADE_VJP_BYTES <= budget

    # cached records amortize the trace across the whole step (and across
    # steps via trace_every) — worth shrinking the per-group vjp working
    # set (more groups) to keep them resident; per-group dispatches are
    # one lax.scan iteration each (opt/accum.py scan variant), not host
    # round-trips, so extra groups cost almost nothing.
    # replay is strictly faster per step (no shade-side re-gather), so try
    # EVERY viable group count for replay before falling back to light
    # records (r4 regression: light-at-g8 shadowed replay-at-g16)
    for rec_bytes, replay in ((REPLAY_REC_BYTES, True),
                              (LIGHT_REC_BYTES, False)):
        for g in (groups, 2 * groups, 4 * groups):
            if g > spp:
                break
            if fits(rec_bytes, cached=True, g=g):
                return StepPlan(g, min(chunk, max(spp // g, 1)),
                                replay, True)
    return StepPlan(groups, chunk, False, False)
