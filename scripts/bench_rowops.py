"""Fetch-forced TPU micro-bench: span-binned rowops vs XLA gather/scatter.

Coherent indices model march hits (neighboring rays hit nearby pixels);
the random case is the worst-case bound.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from materialist_tpu.ops.pallas import rowops

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 512
K = 12
M = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * 512 * 512

rng = np.random.RandomState(0)
table = jnp.asarray(rng.randn(N, K).astype(np.float32))
cot = jnp.asarray(rng.randn(M, 8).astype(np.float32))

# coherent: blocks of 1024 queries spanning ~2000 rows
base = rng.randint(0, N, size=(M // 1024 + 1,))
idx_coh = jnp.asarray(((np.repeat(base, 1024)[:M]
                        + rng.randint(0, 2000, size=M)) % N).astype(np.int32))
idx_rnd = jnp.asarray(rng.randint(0, N, size=M).astype(np.int32))


def fetch(x):
    return float(jnp.ravel(x)[0])


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    print(f"{name:42s} {(time.time()-t0)/reps*1000:9.2f} ms", flush=True)


print(f"== N={N} K={K} M={M} ==")
xla_gather = jax.jit(lambda t, i: t[i])
xla_scatter = jax.jit(
    lambda c, i: jnp.zeros((N, 8), jnp.float32).at[i].add(c))
pl_gather = jax.jit(lambda t, i: rowops.row_gather(t, i, exact=True,
                                                   coherent=True))
pl_gather_f = jax.jit(lambda t, i: rowops.row_gather(t, i, exact=False,
                                                     coherent=True))
pl_scatter = jax.jit(lambda c, i: rowops.row_scatter_add(c, i, N,
                                                         exact=True,
                                                         coherent=True))
pl_scatter_f = jax.jit(lambda c, i: rowops.row_scatter_add(c, i, N,
                                                           exact=False,
                                                           coherent=True))
# default (coherent=False): sort → permute → span kernel
pl_scatter_sort = jax.jit(lambda c, i: rowops.row_scatter_add(c, i, N,
                                                              exact=True))

timeit("XLA row-gather 12ch", xla_gather, table, idx_coh)
timeit("pallas span-gather exact coherent", pl_gather, table, idx_coh)
timeit("pallas span-gather fast  coherent", pl_gather_f, table, idx_coh)
timeit("pallas span-gather fast  random", pl_gather_f, table, idx_rnd)
timeit("XLA scatter-add 8ch", xla_scatter, cot, idx_coh)
timeit("pallas span-scatter exact coherent", pl_scatter, cot, idx_coh)
timeit("pallas span-scatter fast  coherent", pl_scatter_f, cot, idx_coh)
timeit("pallas span-scatter fast  random", pl_scatter_f, cot, idx_rnd)
timeit("sort+span scatter (default) coherent", pl_scatter_sort, cot,
       idx_coh)
timeit("sort+span scatter (default) random", pl_scatter_sort, cot,
       idx_rnd)

# correctness on-device
g1 = np.asarray(xla_gather(table, idx_coh[:4096]))
np.testing.assert_array_equal(g1, np.asarray(pl_gather(table,
                                                       idx_coh[:4096])))
np.testing.assert_allclose(g1, np.asarray(pl_gather_f(table,
                                                      idx_coh[:4096])),
                           rtol=8e-3, atol=1e-5)
s1 = np.asarray(xla_scatter(cot, idx_coh))
np.testing.assert_allclose(s1, np.asarray(pl_scatter(cot, idx_coh)),
                           rtol=1e-6, atol=1e-4)
np.testing.assert_allclose(s1, np.asarray(pl_scatter_f(cot, idx_coh)),
                           rtol=8e-3, atol=4e-2)
np.testing.assert_allclose(s1, np.asarray(pl_scatter_sort(cot, idx_coh)),
                           rtol=1e-6, atol=1e-4)
s2 = np.asarray(xla_scatter(cot, idx_rnd))
np.testing.assert_allclose(s2, np.asarray(pl_scatter_sort(cot, idx_rnd)),
                           rtol=1e-6, atol=1e-4)
print("correctness: OK")
