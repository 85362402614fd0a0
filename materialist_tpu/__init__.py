"""materialist_tpu — TPU-native single-image inverse rendering framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lez-s/Materialist (arXiv 2501.03717): material prediction (DINOv2+DPT),
differentiable G-buffer path tracing for material/envmap recovery, and a
relighting/editing suite — designed for TPU (SPMD over device meshes,
functional transforms, static shapes) rather than ported from CUDA.

Public entry points:
    materialist_tpu.render   — differentiable renderer (forward + inverse)
    materialist_tpu.models   — MaterialNet (DINOv2 ViT-B + dual DPT heads), PosMLP
    materialist_tpu.opt      — inverse-optimization driver
    materialist_tpu.cli      — reference-compatible command-line front-ends
"""

__version__ = "0.1.0"
