"""Gradient-bias diagnostic for the mat-mlp 'rm' phase (r4 VERDICT item 2:
the full-budget indoor run DIVERGED in [mat-mlp 1/rm]; candidate suspects
are the r4 speed approximations). Measures, at the production 512²×64spp
workload on the real chip, the gradient DIFFERENCE each approximation
introduces relative to the cleanest estimator, using MATCHED PRNG keys so
common MC noise cancels and the systematic component is visible:

  * bf16 scatter-payload adjoint (rowops exact=False)   vs f32-exact
  * wavefront compaction (cap-dropped rays)             vs uncompacted
  * replay records (bf16 material rows in the shade)    vs re-gather

For each variant v and key k we compute g_v(k) and g_clean(k) on the
'rm'-phase loss (exposure ratio + 3·(l1/mse)·mse + l1 + 0.1·aux, exactly
opt/loop.py), then report over N keys:

  bias_v  = || mean_k (g_v - g_clean) ||  /  || mean_k g_clean ||
  noise_v = std of the per-key diff norm (is the bias > its own noise?)
  cos_v   = cosine(mean g_v, mean g_clean)

Run:  python scripts/diag_gradbias.py [--res 512] [--spp 64] [--keys 8]
"""

import argparse
import json
import os
import sys
import time

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def tree_dot(a, b):
    return sum(jnp.vdot(x, y) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def tree_norm(a):
    return float(jnp.sqrt(tree_dot(a, a).real))


def tree_sub(a, b):
    return jax.tree.map(lambda x, y: x - y, a, b)


def tree_add(a, b):
    return jax.tree.map(lambda x, y: x + y, a, b)


def tree_scale(a, s):
    return jax.tree.map(lambda x: x * s, a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--keys", type=int, default=8)
    ap.add_argument("--scene", default="indoor")
    args = ap.parse_args()

    from materialist_tpu.camera import Camera
    from materialist_tpu.io import exr, image as image_io
    from materialist_tpu.models import posmlp
    from materialist_tpu.ops.color import linear_to_srgb
    from materialist_tpu.ops.pallas import rowops
    from materialist_tpu.opt.step import make_phase_step
    from materialist_tpu.render.scene import Materials, make_gbuffer
    from materialist_tpu.render.shader import (RenderConfig,
                                               probe_compact_caps)

    base = f"/root/reference/output_imgs/{args.scene}"

    def rd(p):
        return jnp.asarray(image_io.read(os.path.join(base, p)))

    def rs(x, ch):
        if x.ndim == 2:
            x = x[..., None]
        x = x[..., :ch]
        if x.shape[0] != args.res:
            x = jax.image.resize(x, (args.res, args.res, ch), "bilinear")
        return x

    gt = rs(jnp.asarray(exr.read(f"{base}/gt_image.exr")), 3)
    albedo = jnp.clip(rs(rd("albedoPred.exr"), 3), 0, 1)
    rough = jnp.clip(rs(rd("roughnessPred.png"), 1) * 0 + 0.7, 0.07, 1)
    metal = jnp.clip(rs(rd("metallicPred.png"), 1) * 0 + 0.05, 0, 1)
    normal = rs(rd("normalPred.exr"), 3)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    depth = rs(jnp.asarray(exr.read(f"{base}/depthPred.exr")), 1)[..., 0]
    cam = Camera(args.res, args.res)
    gbuf = make_gbuffer(depth, cam, flip_depth=True)
    envmap = jnp.ones((16, 32, 3), jnp.float32)  # loop-1 'rm' lighting
    gt_srgb = linear_to_srgb(gt)
    gt_mean = jnp.mean(gt)

    h = w = args.res
    n = h * w
    start_arm = jnp.clip(jnp.concatenate(
        [albedo.reshape(n, 3), rough.reshape(n, 1), metal.reshape(n, 1)],
        axis=-1), 0, 1)
    net = posmlp.make_brdf_net("arm")
    params0 = net.init(jax.random.PRNGKey(2), start_arm)["params"]

    sg = jax.lax.stop_gradient

    def maps_of(p, extra):
        out = net.apply({"params": p}, start_arm)
        r = jnp.clip(out[..., 3:4] * 0.93 + 0.07, 0, 1).reshape(h, w, 1)
        m = jnp.clip(out[..., 4:5], 0, 1).reshape(h, w, 1)
        mats = Materials(sg(albedo), r, m, sg(normal))
        return mats, envmap

    def loss_of(maps, img, extra):
        mats = maps[0]
        ratio = gt_mean / jnp.maximum(sg(jnp.mean(img)), 1e-9)
        pred = linear_to_srgb(img * ratio)
        mse = jnp.mean((pred - gt_srgb) ** 2)
        l1 = jnp.mean(jnp.abs(pred - gt_srgb))
        aux = (jnp.mean(jnp.abs(mats.roughness - rough))
               + jnp.mean(jnp.abs(mats.metallic - metal)))
        scale_ratio = sg(l1 / jnp.maximum(mse, 1e-12))
        loss = 3.0 * scale_ratio * mse + l1 + 0.1 * aux
        return loss, mse

    base_cfg = RenderConfig(spp=args.spp, chunk=args.chunk,
                            film_jitter=0.5)
    mats0 = Materials(albedo, rough, metal, normal)
    caps = ()
    if jax.default_backend() == "tpu":
        caps = probe_compact_caps(jax.random.PRNGKey(99), base_cfg, cam,
                                  gbuf, mats0, envmap)
        print(f"[gradbias] compact caps: {caps}", flush=True)

    def grad_fn(cfg, exact_adj):
        rowops.set_adjoint_exact(exact_adj)
        phase = make_phase_step(cfg, cam, gbuf, maps_of, loss_of)
        print(f"[gradbias]   plan groups={phase.n_groups} "
              f"chunk={phase.cfg.chunk} replay={phase.cfg.replay_blob} "
              f"caps={phase.cfg.compact_caps} exact_adj={exact_adj}",
              flush=True)

        def g(k):
            recs = phase.trace_all(params0, None, k)
            loss, mse, grads = phase.value_and_grad(params0, None, recs)
            return loss, grads
        return g

    variants = {
        "clean": (base_cfg._replace(replay_blob=False), True),
        "bf16_adjoint": (base_cfg._replace(replay_blob=False), False),
        "replay": (base_cfg, False),
        "compact": (base_cfg._replace(compact_caps=caps), False),
        "production": (base_cfg._replace(compact_caps=caps), False),
    }
    # production == compact here (replay decided by the plan); keep both
    # rows so the plan's own choice is visible in the log
    keys = [jax.random.PRNGKey(1000 + i) for i in range(args.keys)]

    grads = {}
    for name, (cfg, exact) in variants.items():
        gfn = grad_fn(cfg, exact)
        per_key = []
        t0 = time.time()
        for k in keys:
            loss, g = gfn(k)
            per_key.append(jax.tree.map(np.asarray, g))
        print(f"[gradbias] {name}: {args.keys} keys in "
              f"{time.time() - t0:.1f}s (loss {float(loss):.4f})",
              flush=True)
        grads[name] = per_key
    rowops.set_adjoint_exact(False)

    clean = grads["clean"]
    mean_clean = clean[0]
    for g in clean[1:]:
        mean_clean = tree_add(mean_clean, g)
    mean_clean = tree_scale(mean_clean, 1.0 / len(clean))
    nrm_clean = tree_norm(mean_clean)

    out = {}
    for name, per_key in grads.items():
        if name == "clean":
            continue
        diffs = [tree_sub(g, gc) for g, gc in zip(per_key, clean)]
        mean_diff = diffs[0]
        for d in diffs[1:]:
            mean_diff = tree_add(mean_diff, d)
        mean_diff = tree_scale(mean_diff, 1.0 / len(diffs))
        diff_norms = [tree_norm(d) for d in diffs]
        mean_v = per_key[0]
        for g in per_key[1:]:
            mean_v = tree_add(mean_v, g)
        mean_v = tree_scale(mean_v, 1.0 / len(per_key))
        cos = float(tree_dot(mean_v, mean_clean).real / (
            tree_norm(mean_v) * nrm_clean + 1e-30))
        row = {
            "bias_rel": tree_norm(mean_diff) / (nrm_clean + 1e-30),
            "per_key_diff_rel_mean": float(np.mean(diff_norms))
            / (nrm_clean + 1e-30),
            "per_key_diff_rel_std": float(np.std(diff_norms))
            / (nrm_clean + 1e-30),
            "cos_vs_clean": cos,
        }
        out[name] = row
        print(f"[gradbias] {name:14s} bias_rel={row['bias_rel']:.4f} "
              f"per-key diff {row['per_key_diff_rel_mean']:.4f}"
              f"±{row['per_key_diff_rel_std']:.4f} cos={cos:.6f}",
              flush=True)

    # MC noise floor of the clean estimator itself (per-key deviation
    # from its mean): biases far below this are harmless
    dev = [tree_norm(tree_sub(g, mean_clean)) for g in clean]
    noise = float(np.mean(dev)) / (nrm_clean + 1e-30)
    print(f"[gradbias] clean-estimator per-key MC noise (rel): "
          f"{noise:.4f}", flush=True)
    out["mc_noise_rel"] = noise
    print(json.dumps(out))


if __name__ == "__main__":
    main()
