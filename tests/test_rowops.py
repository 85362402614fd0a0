"""Span-binned Pallas row gather/scatter: exactness vs plain indexing.

Runs the TPU kernels in Pallas interpret mode on CPU (the `-m tpu` suite
re-checks them compiled on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from materialist_tpu.ops.pallas import rowops


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(rowops, "_INTERPRET", True)


def _mk(n, k, m, coherent, seed=0):
    rng = np.random.RandomState(seed)
    table = rng.randn(n, k).astype(np.float32)
    if coherent:
        base = rng.randint(0, n, size=(m // 64 + 1,))
        idx = (np.repeat(base, 64)[:m] + rng.randint(-40, 40, size=m)) % n
    else:
        idx = rng.randint(0, n, size=m)
    return jnp.asarray(table), jnp.asarray(idx.astype(np.int32))


@pytest.mark.parametrize("coherent", [True, False])
@pytest.mark.parametrize("n,k,m", [(1100, 8, 2048), (512, 3, 777),
                                   (2048, 12, 1024)])
def test_row_gather_exact(n, k, m, coherent):
    table, idx = _mk(n, k, m, coherent)
    tiles, nt = rowops._tileize(table)
    out = rowops._row_gather_tpu(tiles, idx, n, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


@pytest.mark.parametrize("coherent", [True, False])
@pytest.mark.parametrize("n,k,m", [(1100, 8, 2048), (700, 4, 900)])
def test_row_scatter_exact(n, k, m, coherent):
    rng = np.random.RandomState(3)
    _, idx = _mk(n, k, m, coherent, seed=1)
    cot = rng.randn(m, k).astype(np.float32)
    out = rowops._row_scatter_tpu(jnp.asarray(cot), idx, n, k)
    ref = np.zeros((n, k), np.float32)
    np.add.at(ref, np.asarray(idx), cot)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6, atol=1e-5)


def test_channel_split_paths(monkeypatch):
    """Driver-level channel splitting must agree with the single call."""
    monkeypatch.setattr(rowops, "VMEM_TABLE_BYTES", 1024 * 16)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    table, idx = _mk(600, 6, 512, True)
    out = rowops.row_gather(table, idx.reshape(4, 128), coherent=True)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(table)[np.asarray(idx)].reshape(4, 128, 6))

    cot = jnp.asarray(np.random.RandomState(0).randn(512, 6)
                      .astype(np.float32))
    out2 = rowops.row_scatter_add(cot, idx, 600, coherent=True)
    ref = np.zeros((600, 6), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(cot))
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-6, atol=1e-5)


def test_sort_scatter_matches_reference(monkeypatch):
    """The incoherent path (argsort → permute → span kernel on the sorted
    stream) must equal a plain indexed scatter-add."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.RandomState(7)
    n, k, m = 1500, 5, 4096
    idx = rng.randint(0, n, size=m).astype(np.int32)     # fully incoherent
    cot = rng.randn(m, k).astype(np.float32)
    out = rowops.row_scatter_add(jnp.asarray(cot), jnp.asarray(idx), n)
    ref = np.zeros((n, k), np.float32)
    np.add.at(ref, idx, cot)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)
