"""The fused Pallas shade-bounce kernel must reproduce the generic XLA
shade path — image, material gradients, AND envmap gradients — on the
same records. Interpret mode on CPU; `-m tpu` re-checks compiled on
hardware at production block sizes.

Expected deltas are bounded by the paths' only intentional divergences:
the kernel fetches the emitter with exact f32 bilinear weights while the
XLA path quantizes weighted one-hots to bf16 (~2⁻⁸ relative), and the
fused path consumes PACKED records — wo/win planes rounded to bf16 at
trace time (r4: the packing is assembled once in the trace so the shade
and its checkpoint recompute are pure kernel calls). The shading normal
rides f32 (bf16-rounding it alone inflated the roughness gradient's L1
aggregate to ~15% through dGGX/dρ — measured r4, fixed by the split
nrmf/auxf records); the residual wo/win second-rounding leaves ~2%
zero-mean noise on the roughness grads (signed bias <0.5%).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.camera import Camera
from materialist_tpu.ops.color import linear_to_srgb
from materialist_tpu.ops.pallas import shadebounce as sb
from materialist_tpu.render.scene import Materials, make_gbuffer
from materialist_tpu.render.shader import (RenderConfig,
                                           shade_from_records,
                                           trace_step_records)


def _scene(res=16):
    cam = Camera(res, res)
    depth = 2.0 + jax.random.uniform(jax.random.PRNGKey(0), (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)
    key_m = jax.random.PRNGKey(5)
    mats = Materials(
        jax.random.uniform(key_m, (res, res, 3), minval=0.2, maxval=0.9),
        jnp.full((res, res, 1), 0.4),
        jnp.full((res, res, 1), 0.3), gbuf.normal_geo)
    env = (jax.random.uniform(jax.random.PRNGKey(6), (8, 16, 3)) + 0.1) * 2
    return cam, gbuf, mats, env


CFG = RenderConfig(spp=4, chunk=2, max_depth=3, march_steps=6,
                   shadow_steps=4, march_vectorized=True)


def _run(cam, gbuf, mats, env, fused: bool, monkeypatch):
    monkeypatch.setattr(sb, "_INTERPRET", fused)
    key = jax.random.PRNGKey(3)
    recs = trace_step_records(key, CFG, cam, gbuf, mats, env)

    def loss(params):
        img = shade_from_records(key, recs, CFG, cam, gbuf,
                                 params["mats"], params["envmap"])
        return jnp.mean(linear_to_srgb(img) ** 2), img

    (val, img), grads = jax.value_and_grad(loss, has_aux=True)(
        {"mats": mats, "envmap": env})
    return np.asarray(img), float(val), grads


@pytest.mark.parametrize("jitter", [0.0, 0.5])
def test_fused_bounce_matches_generic(monkeypatch, jitter):
    global CFG
    cfg0 = CFG
    CFG = CFG._replace(film_jitter=jitter)
    try:
        cam, gbuf, mats, env = _scene()
        img_ref, val_ref, g_ref = _run(cam, gbuf, mats, env, False,
                                       monkeypatch)
        img_f, val_f, g_f = _run(cam, gbuf, mats, env, True, monkeypatch)
    finally:
        CFG = cfg0

    # atol 2e-2: bf16 wo/win planes through the GGX chain — see module
    # docstring (the normal rides f32)
    np.testing.assert_allclose(img_f, img_ref, rtol=2e-2, atol=2e-2)
    assert abs(val_f - val_ref) <= 5e-3 * max(abs(val_ref), 1e-3)
    # Per-element bounds sized to one extra bf16 rounding of the wo/win
    # directions: roughness flows through dD/dρ, the steepest
    # amplification of a direction perturbation, so its elementwise bound
    # is wider; the MEAN + SIGNED-MEAN bounds below are the ones that
    # catch a systematic gradient bug (measured r4: mean_rel 0.002/0.020/
    # 0.003, signed bias ≤0.2% on all three).
    elem_tol = {"albedo": 3e-2, "roughness": 0.12, "metallic": 3e-2}
    for name in ("albedo", "roughness", "metallic"):
        a = np.asarray(getattr(g_f["mats"], name))
        b = np.asarray(getattr(g_ref["mats"], name))
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, atol=elem_tol[name] * scale,
                                   err_msg=f"grad mismatch: {name}")
        mean_rel = np.abs(a - b).mean() / max(np.abs(b).mean(), 1e-12)
        assert mean_rel <= 5e-2, \
            f"grad noise too high: {name} mean rel {mean_rel:.3f}"
        bias = abs((a - b).mean()) / max(np.abs(b).mean(), 1e-12)
        assert bias <= 1e-2, \
            f"systematic grad bias: {name} signed mean rel {bias:.4f}"
    a, b = np.asarray(g_f["envmap"]), np.asarray(g_ref["envmap"])
    np.testing.assert_allclose(a, b, atol=3e-2 * max(np.abs(b).max(), 1e-8),
                               err_msg="grad mismatch: envmap")


def test_fused_bounce_normal_grads_zero_for_mesh_normals(monkeypatch):
    """use_mesh_normal=True: the packed blob's normal channels get no
    gradient in either path (geometry is detached)."""
    cam, gbuf, mats, env = _scene()
    _, _, g = _run(cam, gbuf, mats, env, True, monkeypatch)
    np.testing.assert_allclose(np.asarray(g["mats"].normal), 0.0, atol=0.0)


@pytest.mark.tpu
def test_fused_bounce_matches_generic_on_tpu():
    """Hardware equivalence at a production-like block count: the compiled
    kernel (not interpret) vs the XLA path, same records."""
    import os
    if os.environ.get("MATERIALIST_TPU_TESTS") != "1":
        pytest.skip("TPU tests disabled")
    cam, gbuf, mats, env = _scene(res=64)
    cfg = RenderConfig(spp=4, chunk=4, max_depth=3)
    key = jax.random.PRNGKey(3)
    recs = trace_step_records(key, cfg, cam, gbuf, mats, env)

    def loss_fused(params):
        img = shade_from_records(key, recs, cfg, cam, gbuf,
                                 params["mats"], params["envmap"])
        return jnp.mean(linear_to_srgb(img) ** 2)

    # the generic path on TPU: force a non-disney kind marker
    from materialist_tpu.render import bsdf as bsdf_mod

    def loss_generic(params):
        b = bsdf_mod.disney(params["mats"])._replace(kind="generic")
        img = shade_from_records(key, recs, cfg, cam, gbuf,
                                 params["mats"], params["envmap"], bsdf=b)
        return jnp.mean(linear_to_srgb(img) ** 2)

    p = {"mats": mats, "envmap": env}
    vf, gf = jax.jit(jax.value_and_grad(loss_fused))(p)
    vg, gg = jax.jit(jax.value_and_grad(loss_generic))(p)
    assert abs(float(vf) - float(vg)) <= 2e-3 * max(abs(float(vg)), 1e-3)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gg)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=3e-2 * max(np.abs(b).max(),
                                                         1e-8))
