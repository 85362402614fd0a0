"""MaterialNet inference wrapper: image → material map dict.

Counterpart of MaterialNet.infer_image (Material_net/dpt.py:219-269):
lower-bound aspect-preserving resize to a multiple of 14 (cv2 cubic), jit
forward, bilinear-align-corners restore to input resolution.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from materialist_tpu.models.convert import load_matnet_params
from materialist_tpu.models.dpt import MaterialNet, preprocess
from materialist_tpu.ops.resize import bilinear_align_corners

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def resize_lower_bound(image: np.ndarray, target: int = 518,
                       multiple: int = 14) -> np.ndarray:
    """Aspect-preserving 'lower_bound' resize to ≥target, dims constrained
    to multiples of 14 (util/transform.py Resize semantics)."""
    h, w = image.shape[:2]
    scale = max(target / h, target / w)

    def constrain(x):
        return max(int(np.round(x * scale / multiple) * multiple), target)

    nh, nw = constrain(h), constrain(w)
    if cv2 is not None:
        return cv2.resize(image, (nw, nh), interpolation=cv2.INTER_CUBIC)
    from materialist_tpu.io.image import resize_bilinear_align_corners
    return resize_bilinear_align_corners(image, (nh, nw))


class MatNetInference:
    """Holds converted params + the jitted forward."""

    def __init__(self, params=None, weights_path: str = None, net=None):
        self.net = net or MaterialNet()
        if params is None:
            if weights_path and weights_path.endswith(".npz"):
                # native checkpoint (models/train.py save_checkpoint) —
                # e.g. the in-repo self-trained reduced checkpoint
                from materialist_tpu.models.train import load_checkpoint
                params, _, cfg = load_checkpoint(weights_path)
                if cfg is not None and net is None:
                    cfg = dict(cfg)
                    for k in ("out_channels", "layer_idx"):
                        if k in cfg:
                            cfg[k] = tuple(cfg[k])
                    self.net = MaterialNet(**cfg)
            else:
                params = load_matnet_params(weights_path)
        # device arrays, not numpy leaves: numpy constants embedded in the
        # jitted forward reject traced indices (pos-embed interpolation)
        self.params = jax.tree.map(jnp.asarray, params)

    @functools.partial(jax.jit, static_argnums=0)
    def _forward(self, params, x):
        # params ride as an argument, NOT via self: with static self they
        # would be baked into the HLO as constants and travel inside the
        # axon remote-compile request (HTTP 413 at large sizes — same
        # failure class as scripts/train_matnet_device.py's dataset)
        return self.net.apply({"params": params}, x)

    def infer_image(self, raw_image: np.ndarray,
                    input_size: int = 518) -> dict:
        """raw_image (H, W, 3) float [0,1] (or uint8) → dict of numpy maps
        at (H, W) (dpt.py:219-241)."""
        if raw_image.dtype == np.uint8:
            raw_image = raw_image.astype(np.float32) / 255.0
        h, w = raw_image.shape[:2]
        img = resize_lower_bound(raw_image.astype(np.float32), input_size)
        if img.mean() >= 10:
            warnings.warn("Pixel intensity too high; dividing by 255.")
            img = img / 255.0
        out = self._forward(self.params, preprocess(img))
        maps = {}
        for k, v in out.items():
            v = bilinear_align_corners(v[0], (h, w))
            arr = np.asarray(v)
            maps[k] = arr[..., 0] if arr.shape[-1] == 1 else arr
        return maps


def random_params(seed: int = 0):
    """Randomly-initialized params (for tests / environments without the
    checkpoint)."""
    net = MaterialNet()
    x = jnp.zeros((1, 518, 518, 3))
    return net.init(jax.random.PRNGKey(seed), x)["params"]
