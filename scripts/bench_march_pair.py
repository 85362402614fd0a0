"""Equivalence + timing: march_pair (v3, paired R-row kernel) vs two
march_fused (v2) calls on the indoor fixture.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_march_pair.py [RES] [CHUNK]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from materialist_tpu.camera import Camera
from materialist_tpu.io import exr
from materialist_tpu.render.scene import make_gbuffer
from materialist_tpu.ops.pallas.march_kernel import march_fused, march_pair

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 8

base = "/root/reference/output_imgs/indoor"
depth = jnp.asarray(exr.read(f"{base}/depthPred.exr"))[..., 0]
if depth.shape[0] != RES:
    depth = jax.image.resize(depth, (RES, RES), "bilinear")
cam = Camera(RES, RES)
gbuf = make_gbuffer(depth, cam, flip_depth=True)
n = RES * RES
key = jax.random.PRNGKey(0)

pos = jnp.broadcast_to(gbuf.position.reshape(n, 3), (CHUNK, n, 3))
wi = jax.random.normal(key, (CHUNK, n, 3))
wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
wi_e = jax.random.normal(jax.random.fold_in(key, 1), (CHUNK, n, 3))
wi_e = wi_e / jnp.linalg.norm(wi_e, axis=-1, keepdims=True)

v2_lobe = jax.jit(lambda p, d: march_fused(
    cam, gbuf.dist, gbuf.valid, p, d, n_steps=24, fine_steps=6))
v2_shad = jax.jit(lambda p, d: march_fused(
    cam, gbuf.dist, gbuf.valid, p, d, n_steps=16, fine_steps=2).hit)
v3 = jax.jit(lambda p, dl, dn: march_pair(
    cam, gbuf.dist, gbuf.valid, p, dl, dn, n_steps=24, fine_steps=6,
    shadow_steps=16, shadow_fine_steps=2))


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0].astype(jnp.float32))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:40s} {dt:9.1f} ms  ({dt*1e6/(CHUNK*n):5.2f} ns/ray)",
          flush=True)
    return out, dt


print(f"== march pair RES={RES} CHUNK={CHUNK} ({CHUNK*n/1e6:.1f}M rays) ==",
      flush=True)
(h3, s3), t3 = timeit("v3 march_pair (lobe+shadow)", v3, pos, wi, wi_e)
h2, t2a = timeit("v2 lobe march", v2_lobe, pos, wi)
s2, t2b = timeit("v2 shadow march", v2_shad, pos, wi_e)
print(f"speedup: {(t2a + t2b) / t3:.2f}x", flush=True)

h2h, h2i, h2t = np.asarray(h2.hit), np.asarray(h2.idx), np.asarray(h2.t)
h3h, h3i, h3t = np.asarray(h3.hit), np.asarray(h3.idx), np.asarray(h3.t)
print("hit  mismatch:", int((h2h != h3h).sum()), "/", h2h.size)
print("idx  mismatch (where both hit):",
      int(((h2i != h3i) & h2h & h3h).sum()))
print("t    max|d| (where both hit):",
      float(np.abs(np.where(h2h & h3h, h2t - h3t, 0)).max()))
print("shad mismatch:", int((np.asarray(s2) != np.asarray(s3)).sum()),
      "/", s2.size)
