"""Whole-step TPU smoke test (VERDICT r2 weak #6 / next-step 7): run real
`opt.loop.optimize` epochs at 128² on the hardware path — fused Pallas
march, span-binned row gather/scatter adjoints, fused envmap CDF kernels
— so a regression anywhere in the full production step (not just one
kernel) fails `pytest -m tpu`.

Runs only with the real TPU backend (MATERIALIST_TPU_TESTS=1 -m tpu).
Budgeted ≲2 min: 128², spp 8, 3 epochs per phase kind.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="full-step smoke runs on TPU only"),
]


def test_full_inverse_step_on_tpu():
    from materialist_tpu.camera import Camera
    from materialist_tpu.opt.loop import InverseOptions, optimize
    from materialist_tpu.render.scene import make_gbuffer
    from materialist_tpu.render.shader import RenderConfig, render

    res = 128
    cam = Camera(res, res)
    key = jax.random.PRNGKey(0)
    depth = 2.0 + 0.5 * jax.random.uniform(key, (res, res))
    gbuf = make_gbuffer(depth, cam, flip_depth=False)

    # ground truth rendered by the production estimator itself (fixed
    # materials + envmap), so the optimization has a consistent target
    gt_mats = {
        "albedo": jnp.full((res, res, 3), 0.6),
        "roughness": jnp.full((res, res, 1), 0.5),
        "metallic": jnp.full((res, res, 1), 0.1),
        "normal": gbuf.normal_geo,
    }
    from materialist_tpu.render.scene import Materials
    env_gt = jnp.concatenate([jnp.full((16, 16, 3), 2.0),
                              jnp.full((16, 16, 3), 0.2)], axis=1)
    cfg = RenderConfig(spp=8, chunk=8)
    gt = render(jax.random.PRNGKey(9), cfg, cam, gbuf,
                Materials(**gt_mats), env_gt)
    assert bool(jnp.isfinite(gt).all())

    mat = dict(gt_mats, gt_image=gt)
    with tempfile.TemporaryDirectory() as out:
        opts = InverseOptions(opt_src="a", opt_order=("rm", "a"),
                              model_name="none", spp=8, chunk=8,
                              num_epochs=3, max_loops=2, frame_every=0)
        best = optimize(gbuf, cam, mat, out, opts)
        assert np.isfinite(best["loss"]), best["loss"]
        for k in ("albedo", "roughness", "metallic", "envmap"):
            v = np.asarray(best[k])
            assert np.isfinite(v).all(), k
        # §2.10 layout written
        assert os.path.exists(os.path.join(out, "best_results",
                                           "rendered_img.exr"))
