"""Host-side optimization callbacks: early stopping + best-state tracking.

Counterparts of misc.py:37-60 (EarlyStopping — relative-improvement
patience) and misc.py:62-111 (SaveBest — argmin-MSE snapshots persisted to
best_results/). Loss scalars cross the device boundary once per step; the
tracked arrays stay on device and are fetched only when they improve.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from materialist_tpu.io import image as image_io


class EarlyStopping:
    """Stop after `patience` epochs without a `min_delta`-relative improvement."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss: Optional[float] = None
        self.early_stop = False

    def __call__(self, loss: float) -> bool:
        if self.best_loss is None:
            self.best_loss = loss
        elif loss > self.best_loss * (1.0 - self.min_delta):
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_loss = loss
            self.counter = 0
        return self.early_stop


class SaveBest:
    """Track the argmin-loss state of the optimization.

    Stores device arrays by reference (jax arrays are immutable, so no
    cloning is needed — the torch original must detach().clone(),
    misc.py:87-93). `save_results` writes the §2.10 best_results layout.
    """

    KEYS = ("albedo", "roughness", "metallic", "normal", "envmap",
            "rendered_img")

    def __init__(self):
        self.best_loss = float("inf")
        self.best = {k: None for k in self.KEYS}
        self.best_net_params = None

    def update(self, loss: float, albedo, roughness, metallic, normal,
               envmap, rendered_img, net_params=None):
        if loss < self.best_loss:
            self.best_loss = loss
            self.best = {
                "albedo": albedo, "roughness": roughness,
                "metallic": metallic, "normal": normal,
                "envmap": envmap, "rendered_img": rendered_img,
            }
            if net_params is not None:
                self.best_net_params = net_params

    def get_best(self):
        out = dict(self.best)
        out["loss"] = self.best_loss
        return out

    def save_results(self, path: str):
        os.makedirs(path, exist_ok=True)
        names = {
            "envmap": "envmap.hdr", "albedo": "albedo.exr",
            "roughness": "roughness.exr", "metallic": "metallic.exr",
            "rendered_img": "rendered_img.exr", "normal": "normal.exr",
        }
        for key, fname in names.items():
            val = self.best.get(key)
            if val is not None:
                image_io.write(os.path.join(path, fname),
                               np.asarray(val, dtype=np.float32))
