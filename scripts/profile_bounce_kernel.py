"""Micro-profile of the fused shade-bounce op at production shapes:
kernel-only vs packing (broadcast/concat/transpose) vs full bounce fwd
and bwd. Identifies whether time goes to the Mosaic kernel or the XLA
glue around it. Usage: python scripts/profile_bounce_kernel.py [S] [N]."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

from materialist_tpu.ops.pallas import shadebounce as sb

S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024 * 1024

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
envmap = jax.random.uniform(ks[0], (16, 32, 3)) + 0.1
blob = jax.random.uniform(ks[1], (S, N, 5), minval=0.1, maxval=0.9)
thr = jax.random.uniform(ks[2], (S, N, 3))
auxf = jax.random.normal(ks[3], (S, N, 11))
recb = (jax.random.uniform(ks[4], (S, N, 13)) * 4).astype(jnp.bfloat16)


def fetch(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0].astype(jnp.float32))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:36s} {dt:9.2f} ms", flush=True)
    return dt


# 1. kernel only (pre-packed planes)
planes = sb.env_lookup_planes(envmap)
b_t = sb._to_planes(blob)
t_t = sb._to_planes(thr)
a_t = sb._to_planes(auxf)
r_t = sb._to_planes(recb)
nb = t_t.shape[1]

import functools
from jax.experimental import pallas as pl

fwd_raw = jax.jit(functools.partial(sb._fwd_call, h=16, w=32))
timeit("fwd op (pack+kernel+unpack)", fwd_raw, planes, blob, thr, auxf, recb)

pack = jax.jit(lambda b, t, a, r: (sb._to_planes(b), sb._to_planes(t),
                                   sb._to_planes(a), sb._to_planes(r)))
timeit("pack only (_to_planes x4)", pack, blob, thr, auxf, recb)

full = jax.jit(lambda e, b, t, a, r: sb.shade_bounce_fused(e, b, t, a, r))
timeit("bounce fwd (custom-vjp op)", full, envmap, blob, thr, auxf, recb)


# NOTE: auxf/recb must be explicit args — closing over them embeds 350 MB
# of literals in the remote-compile request (HTTP 413 through the tunnel)
def loss(e, b, t, a, r):
    o1, o2 = sb.shade_bounce_fused(e, b, t, a, r)
    return jnp.sum(o1) + jnp.sum(o2)


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
timeit("bounce grad (fwd+bwd+denv)", g, envmap, blob, thr, auxf, recb)


def loss_noenv(b, t, a, r):
    o1, o2 = sb.shade_bounce_fused(jax.lax.stop_gradient(envmap), b, t,
                                   a, r)
    return jnp.sum(o1) + jnp.sum(o2)


g2 = jax.jit(jax.grad(loss_noenv, argnums=(0, 1)))
timeit("bounce grad (env detached)", g2, blob, thr, auxf, recb)
