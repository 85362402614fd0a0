"""Train a REDUCED MaterialNet checkpoint from scratch on self-rendered
MG data (r4 VERDICT item 4 — "weights or it didn't happen": the real
HuggingFace checkpoint is unreachable in this zero-egress container, so
the photograph→materials capability is demonstrated with an in-repo
trained substitute).

Architecture: the same DINOv2+dual-DPT MaterialNet (models/dpt.py) with
a reduced encoder (embed 384, depth 6, heads 6; DPT features 64) —
~18M params ⇒ a committable f16 npz. The npz stores the constructor
config, so `cli/inverse.py --weights checkpoint.npz` rebuilds it
automatically (models/matnet.py).

Data: scripts/make_mg_dataset.py scenes rendered at 238×322 (multiple of
14) by the framework's own renderer — the im→maps mapping the net learns
is exactly the transport the inverse stage inverts.

    python scripts/train_matnet_scratch.py OUT_DIR [--scenes 150]
        [--per-scene 3] [--steps 3000] [--batch 4] [--time-budget 3600]
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

IM_HW = (238, 322)   # nearest multiple-of-14 of the reference's 240×320

REDUCED = dict(features=64, out_channels=(48, 96, 192, 384),
               layer_idx=(1, 2, 4, 5), embed_dim=384, enc_depth=6,
               num_heads=6)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scenes", type=int, default=150)
    ap.add_argument("--per-scene", type=int, default=3)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--time-budget", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-data", action="store_true")
    args = ap.parse_args()

    from materialist_tpu.models.dataset import MGDataset
    from materialist_tpu.models.dpt import MaterialNet
    from materialist_tpu.models.train import (make_train_step,
                                              matnet_losses,
                                              save_checkpoint)
    import optax

    data_dir = os.path.join(args.out, "mg_data")
    if not args.skip_data and not os.path.exists(
            os.path.join(data_dir, "train.txt")):
        print(f"[scratch] rendering {args.scenes}×{args.per_scene} MG "
              f"tuples at {IM_HW} ×{args.spp}spp", flush=True)
        from make_mg_dataset import generate
        t0 = time.time()
        generate(data_dir, args.scenes, args.per_scene, IM_HW[0],
                 IM_HW[1], args.spp, seed=args.seed)
        print(f"[scratch] dataset rendered in {time.time() - t0:.0f}s",
              flush=True)

    net = MaterialNet(**REDUCED)
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1,) + IM_HW + (3,)))["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"[scratch] reduced MaterialNet: {n_params / 1e6:.1f}M params",
          flush=True)

    # from-scratch: nothing frozen; cosine decay to 10% with warmup
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=max(args.steps, 101),
        end_value=args.lr * 0.1)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adamw(sched, weight_decay=0.01))
    opt_state = optimizer.init(params)
    step_fn = make_train_step(net, optimizer)

    ds = MGDataset(data_dir, im_height=IM_HW[0], im_width=IM_HW[1],
                   phase="TRAIN", random_flip=True)
    deadline = time.time() + args.time_budget if args.time_budget else None

    it = 0
    hist = []
    t0 = time.time()
    epoch = 0
    stop = False
    while not stop:
        for batch in ds.batches(args.batch, seed=epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, losses = step_fn(params, opt_state, batch)
            if it % 25 == 0:
                vals = {k: float(v) for k, v in losses.items()}
                hist.append({"it": it, **vals})
                print(f"[scratch] it {it} " + " ".join(
                    f"{k}={v:.4f}" for k, v in vals.items()), flush=True)
            it += 1
            if it >= args.steps or (deadline and time.time() > deadline):
                stop = True
                break
        epoch += 1

    ckpt = os.path.join(args.out, "matnet_scratch.npz")
    save_checkpoint(ckpt, params, it, config=net.encoder_config(),
                    half=True)
    sz = os.path.getsize(ckpt) / 1e6
    print(f"[scratch] checkpoint {ckpt} ({sz:.1f} MB) after {it} steps, "
          f"{(time.time() - t0) / 60:.1f} min", flush=True)

    # held-out eval: fresh scenes (seed offset), report map PSNR
    from make_mg_dataset import generate as gen_eval
    eval_dir = os.path.join(args.out, "mg_eval")
    if not os.path.exists(os.path.join(eval_dir, "train.txt")):
        gen_eval(eval_dir, 4, 2, IM_HW[0], IM_HW[1], args.spp,
                 seed=args.seed + 7777)
    ev = MGDataset(eval_dir, im_height=IM_HW[0], im_width=IM_HW[1],
                   phase="TRAIN", random_flip=False)
    fwd = jax.jit(lambda p, x: net.apply({"params": p}, x))
    psnrs = {k: [] for k in ("albedo", "roughness", "metallic", "normal",
                             "depth")}
    for i in range(len(ev)):
        s = ev[i]
        pred = fwd(params, jnp.asarray(s["im"])[None])
        for k in psnrs:
            p = np.asarray(pred[k][0], np.float32)
            g = np.asarray(s[k], np.float32)
            if k == "depth":
                # scale-invariant: compare after median alignment
                p = p * (np.median(g) / max(np.median(p), 1e-6))
            rng = max(float(g.max() - g.min()), 1e-6)
            mse = float(np.mean((p - g) ** 2))
            psnrs[k].append(10 * np.log10(rng * rng / max(mse, 1e-12)))
    summary = {k: round(float(np.mean(v)), 2) for k, v in psnrs.items()}
    print(f"[scratch] held-out map PSNR (dB): {summary}", flush=True)

    with open(os.path.join(args.out, "train_log.json"), "w") as f:
        json.dump({"steps": it, "params_M": n_params / 1e6,
                   "history": hist, "heldout_psnr_db": summary,
                   "checkpoint_mb": sz}, f, indent=1)
    print(json.dumps({"steps": it, "heldout_psnr_db": summary}))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.exit(main())
