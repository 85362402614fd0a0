"""Microbench: random row scatter-add / gather strategies on TPU.

The material-table gather + scatter-add adjoint at secondary path vertices
is the rate-limiting random-access op of the inverse step (~134M rows/step
at 1024^2 x 64spp). Candidates:

  g1  XLA serialized row gather (table[idx]) at widths 1/4/8/13
  s1  XLA .at[idx].add
  s2  sort(idx, iota) -> perm-gather cot -> span kernel   (current rowops)
  s3  sort(idx, packed bf16 cot words) -> span kernel     (no perm gather)
  s4  s2 on PRE-SORTED idx (span only)                    (lower bound)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_scatter_variants.py [M] [N] [K]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

M = int(sys.argv[1]) if len(sys.argv) > 1 else 8_388_608
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_048_576
K = int(sys.argv[3]) if len(sys.argv) > 3 else 5

key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (M,), 0, N, dtype=jnp.int32)
cot = jax.random.normal(jax.random.fold_in(key, 1), (M, K), jnp.float32)
table = jax.random.normal(jax.random.fold_in(key, 2), (N, 13), jnp.float32)


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
    print(f"{name:46s} {dt:9.1f} ms   {dt*1e6/M:6.2f} ns/row", flush=True)
    return dt


# ---- gathers at several widths
for k in (1, 4, 8, 13):
    timeit(f"g1 XLA row gather {k}ch",
           jax.jit(lambda t, i, k=k: t[:, :k][i]), table, idx)

# ---- s1 baseline
timeit("s1 XLA .at[].add 5ch",
       jax.jit(lambda c, i: jnp.zeros((N, K)).at[i].add(c)), cot, idx)

# ---- s2 current rowops path
from materialist_tpu.ops.pallas.rowops import row_scatter_add, _row_scatter_tpu

timeit("s2 sort+perm+span (rowops, 5ch)",
       jax.jit(lambda c, i: row_scatter_add(c, i, N, exact=False)), cot, idx)


# ---- s3 sort with packed bf16 payload (2 bf16 per i32 word via shifts)
def s3(c, i):
    cb = c.astype(jnp.bfloat16)            # (M, K) bf16
    pad_k = (-K) % 2
    if pad_k:
        cb = jnp.pad(cb, ((0, 0), (0, pad_k)))
    u16 = jax.lax.bitcast_convert_type(cb, jnp.uint16).astype(jnp.uint32)
    words = u16[:, 0::2] | (u16[:, 1::2] << 16)          # (M, ceil(K/2))
    nw = words.shape[1]
    ops = (i,) + tuple(words[:, j] for j in range(nw))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    i_s = sorted_ops[0]
    w_s = jnp.stack(sorted_ops[1:], axis=-1)             # (M, nw) u32
    lo = (w_s & 0xFFFF).astype(jnp.uint16)
    hi = (w_s >> 16).astype(jnp.uint16)
    c_s = jnp.stack([lo, hi], axis=-1).reshape(M, -1)[:, :K]
    c_s = jax.lax.bitcast_convert_type(c_s, jnp.bfloat16).astype(jnp.float32)
    return _row_scatter_tpu(c_s, i_s, N, K, exact=False)


timeit("s3 sort(idx+bf16 payload)+span 5ch", jax.jit(s3), cot, idx)

# ---- s5 sort with unpacked f32 payload operands
def s5(c, i):
    ops = (i,) + tuple(c[:, j] for j in range(K))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    i_s = sorted_ops[0]
    c_s = jnp.stack(sorted_ops[1:], axis=-1)
    return _row_scatter_tpu(c_s, i_s, N, K, exact=False)


timeit("s5 sort(idx+5xf32 payload)+span 5ch", jax.jit(s5), cot, idx)

# ---- s4 span on pre-sorted (kernel lower bound)
idx_sorted = jnp.sort(idx)
timeit("s4 span kernel on sorted idx 5ch",
       jax.jit(lambda c, i: _row_scatter_tpu(c, i, N, K, exact=False)),
       cot, idx_sorted)

# ---- sort costs alone
timeit("sort (idx, iota)",
       jax.jit(lambda i: jax.lax.sort(
           (i, jnp.arange(M, dtype=jnp.int32)), num_keys=1)[0]), idx)
timeit("perm-gather 5ch f32 (random perm)",
       jax.jit(lambda c, i: c[i]), cot,
       jax.random.permutation(key, M).astype(jnp.int32))
timeit("perm-gather 3ch f32 (random perm)",
       jax.jit(lambda c, i: c[:, :3][i]), cot,
       jax.random.permutation(key, M).astype(jnp.int32))
