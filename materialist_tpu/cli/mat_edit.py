"""Material-editing CLI — a *working* counterpart of mat_edit.py.

The reference's mat_edit.py is dead code (it imports a nonexistent module,
mat_edit.py:4 — SURVEY.md §2.7); its intended functionality (masked HSV
albedo shift and scalar roughness/metallic edits, which live inside
render_final.py:143-146,165-180) is exposed here as a first-class CLI.

Usage: python -m materialist_tpu.cli.mat_edit --save_name NAME
           [--hue_shift H S V] [--roughness R] [--metallic M]
           [--env_path path.hdr] [--n_iter 10]
"""

from __future__ import annotations

import argparse

import numpy as np

from materialist_tpu.cli.render_final import render_real


def parse_args():
    p = argparse.ArgumentParser(description="masked material editing")
    p.add_argument("--save_name", required=True, type=str)
    p.add_argument("--hue_shift", nargs=3, type=float, default=None,
                   help="HSV shift applied to albedo inside the mask")
    p.add_argument("--roughness", type=float, default=None)
    p.add_argument("--metallic", type=float, default=None)
    p.add_argument("--env_path", type=str, default=None)
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--save_path", type=str, default=None)
    p.add_argument("--n_iter", type=int, default=10)
    p.add_argument("--spp", type=int, default=64)
    return p.parse_args()


def main():
    a = parse_args()
    edit = {
        "albedo": np.array([a.hue_shift]) if a.hue_shift else None,
        "roughness": a.roughness,
        "metallic": a.metallic,
    }
    render_real(a.save_name, a.env_path, edit=edit, n_iter=a.n_iter,
                input_path=a.input_path, save_path=a.save_path, spp=a.spp)


if __name__ == "__main__":
    main()
