"""Benchmark candidate adjoints for the secondary-bounce material gather:
XLA scatter-add vs sort+segment_sum, at the production shape
(table 512²×8, 2M random row indices). Run on the real TPU."""

import time

import jax
import jax.numpy as jnp

N = 512 * 512
K = 8
M = 4 * N  # chunk 4 at 512²

key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (N, K))
idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, N)
cot = jax.random.normal(jax.random.PRNGKey(2), (M, K))


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:45s} {(time.time()-t0)/n*1000:9.2f} ms")
    return out


@jax.jit
def fwd(table, idx):
    return table[idx]


@jax.jit
def adj_scatter(cot, idx):
    return jnp.zeros((N, K), cot.dtype).at[idx].add(cot)


@jax.jit
def adj_sorted(cot, idx):
    order = jnp.argsort(idx)
    si = idx[order]
    sc = cot[order]
    return jax.ops.segment_sum(sc, si, num_segments=N,
                               indices_are_sorted=True)


r1 = timeit("gather fwd (2M x 8)", fwd, table, idx)
r2 = timeit("adjoint: XLA scatter-add", adj_scatter, cot, idx)
r3 = timeit("adjoint: argsort + segment_sum(sorted)", adj_sorted, cot, idx)
print("scatter == sorted:",
      bool(jnp.allclose(r2, r3, atol=1e-3, rtol=1e-3)))

# also: bf16 cotangents
cot16 = cot.astype(jnp.bfloat16)


@jax.jit
def adj_scatter16(cot, idx):
    return jnp.zeros((N, K), jnp.bfloat16).at[idx].add(cot)


timeit("adjoint: scatter-add bf16", adj_scatter16, cot16, idx)
