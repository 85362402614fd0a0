"""MaterialNet training loop (offline stage).

Counterpart of Material_net/train_matnet.py: SiLog depth loss (λ=0.5),
normal loss (1−cos + L1), albedo loss (perceptual + L1), L1 rough/metal
(:73-114), partial fine-tuning that freezes everything except
depth_head.scratch.output_conv2 and the whole material_head scratch
(:163-171), AdamW lr 1e-4 wd 0.01 (:189-194). Lightning+wandb are
replaced by a plain jitted train step + optax.multi_transform freezing +
host-side checkpointing (orbax-compatible trees).

Note: the reference's perceptual term is LPIPS-alex
(train_matnet.py:107-109). The exact network + torch-weight converter
live in models/lpips.py — pass ``lpips.load_lpips(weights_path)`` as
``perceptual_fn`` to reproduce the reference recipe; only the weights
file is an input (zero-egress build). Defaults to 0 when omitted.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from materialist_tpu.models.dpt import MaterialNet

MIN_DEPTH, MAX_DEPTH = 0.01, 20.0


def silog_loss(pred, target, valid, lambd: float = 0.5):
    """Scale-invariant log depth loss (train_matnet.py:30-45)."""
    eps = 1e-4
    pred = jnp.maximum(pred, eps)
    target = jnp.maximum(target, eps)
    diff = (jnp.log(target) - jnp.log(pred)) * valid
    n = jnp.maximum(valid.sum(), 1.0)
    m2 = (diff ** 2).sum() / n
    m1 = diff.sum() / n
    return jnp.sqrt(jnp.maximum(m2 - lambd * m1 ** 2, 1e-12))


def matnet_losses(pred, batch, perceptual_fn: Optional[Callable] = None):
    """Full loss dict (train_matnet.py:88-114)."""
    valid = ((batch["depth"] >= MIN_DEPTH) & (batch["depth"] <= MAX_DEPTH)
             ).astype(jnp.float32)
    l_depth = silog_loss(pred["depth"], batch["depth"], valid)
    cos = jnp.sum(pred["normal"] * batch["normal"], axis=-1)
    l_normal = (1.0 - cos.mean()
                + jnp.abs(pred["normal"] - batch["normal"]).mean())
    l_albedo = jnp.abs(pred["albedo"] - batch["albedo"]).mean()
    if perceptual_fn is not None:
        l_albedo = l_albedo + perceptual_fn(pred["albedo"],
                                            batch["albedo"])
    l_rough = jnp.abs(pred["roughness"] - batch["roughness"]).mean()
    l_metal = jnp.abs(pred["metallic"] - batch["metallic"]).mean()
    total = l_depth + l_normal + l_albedo + l_rough + l_metal
    return {"total": total, "depth": l_depth, "normal": l_normal,
            "albedo": l_albedo, "roughness": l_rough, "metallic": l_metal}


_SCRATCH_KEYS = ("layer1_rn", "layer2_rn", "layer3_rn", "layer4_rn",
                 "refinenet1", "refinenet2", "refinenet3", "refinenet4",
                 "output_conv1", "output_conv2_0", "output_conv2_2")


def freeze_labels(params) -> dict:
    """'train' / 'freeze' label tree matching train_matnet.py:163-171:
    only depth_head's output_conv2 and material_head's scratch train."""
    def label(path_keys):
        keys = [getattr(k, "key", str(k)) for k in path_keys]
        if keys[0] == "depth_head" and keys[1] in ("output_conv2_0",
                                                   "output_conv2_2"):
            return "train"
        if keys[0] == "material_head" and keys[1] in _SCRATCH_KEYS:
            return "train"
        return "freeze"
    return jax.tree_util.tree_map_with_path(
        lambda path, _: label(path), params)


def make_optimizer(params, lr: float = 1e-4, weight_decay: float = 0.01,
                   freeze: bool = True):
    """AdamW over the unfrozen subset (train_matnet.py:189-194)."""
    adamw = optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay)
    if not freeze:
        return adamw
    return optax.multi_transform(
        {"train": adamw, "freeze": optax.set_to_zero()},
        freeze_labels(params))


def make_train_step(net: MaterialNet, optimizer,
                    perceptual_fn: Optional[Callable] = None):
    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = net.apply({"params": p}, batch["im"])
            losses = matnet_losses(pred, batch, perceptual_fn)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


def train(data_root: str, params=None, epochs: int = 1, batch_size: int = 2,
          lr: float = 1e-4, save_path: Optional[str] = None,
          im_hw=(238, 322), log_every: int = 10, return_history=False):
    """Reference-shaped training entry point (plain loop, no Lightning).

    im_hw defaults to the nearest multiple-of-14 of the 240×320 dataset.
    With ``return_history`` the per-step total losses come back alongside
    the params (evidence for end-to-end training runs).
    """
    import numpy as np
    from materialist_tpu.models.dataset import MGDataset

    net = MaterialNet()
    if params is None:
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1,) + tuple(im_hw) + (3,)))["params"]
    optimizer = make_optimizer(params, lr)
    opt_state = optimizer.init(params)
    step = make_train_step(net, optimizer)

    ds = MGDataset(data_root, im_height=im_hw[0], im_width=im_hw[1],
                   phase="TRAIN", random_flip=True)
    it = 0
    history = []
    for epoch in range(epochs):
        for batch in ds.batches(batch_size, seed=epoch):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, losses = step(params, opt_state, batch)
            if return_history:  # host fetch: skip unless asked
                history.append(float(losses["total"]))
            if it % log_every == 0:
                print(f"epoch {epoch} it {it} " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in losses.items()),
                    flush=True)
            it += 1
        if save_path:
            save_checkpoint(save_path, params, it)
    return (params, history) if return_history else params


def save_checkpoint(path: str, params, step: int, config: dict = None,
                    half: bool = False):
    """Flat-npz checkpoint (orbax is heavier than needed for one tree).

    ``config``: the MaterialNet constructor kwargs (encoder_config()) so
    inference can rebuild a non-default architecture. ``half`` stores
    f16 leaves (the committable reduced checkpoint)."""
    import json as _json
    import numpy as np
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrs = {}
    for k, v in flat:
        a = np.asarray(v)
        if half and a.dtype == np.float32:
            a = a.astype(np.float16)
        arrs[jax.tree_util.keystr(k)] = a
    arrs["__step__"] = np.asarray(step)
    if config is not None:
        arrs["__config__"] = np.frombuffer(
            _json.dumps(config).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)


def load_checkpoint(path: str):
    """Rebuild the nested params dict from a save_checkpoint npz.
    Returns (params, step, config-or-None)."""
    import json as _json
    import re
    import numpy as np
    data = np.load(path)
    params = {}
    step = 0
    config = None
    for k in data.files:
        if k == "__step__":
            step = int(data[k])
            continue
        if k == "__config__":
            config = _json.loads(bytes(data[k]).decode())
            continue
        keys = re.findall(r"\['([^']+)'\]", k)
        node = params
        for part in keys[:-1]:
            node = node.setdefault(part, {})
        a = data[k]
        node[keys[-1]] = (a.astype(np.float32)
                          if a.dtype == np.float16 else a)
    return params, step, config
