"""Native C++ depth->mesh builder vs the numpy reference implementation."""

import numpy as np
import pytest

from materialist_tpu.geometry.mesh_recon import (depth_to_mesh,
                                                 depth_to_mesh_native)


def test_native_matches_numpy():
    try:
        from materialist_tpu.io import native
        native.load()
    except Exception:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    depth = 2.0 + rng.random((48, 56)).astype(np.float32)
    depth[10:30, 15:35] += 2.5  # depth step: boundaries + dup fallback
    v1, f1, b1 = depth_to_mesh(depth, impl="numpy")
    v2, f2, b2 = depth_to_mesh_native(depth)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    assert b1.shape == b2.shape
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
    # face ROW order differs (numpy groups good/fallback per emit batch,
    # C++ emits per quad) — the triangle SET must be identical
    def rows_sorted(f):
        return f[np.lexsort(f.T[::-1])]
    np.testing.assert_array_equal(rows_sorted(f1), rows_sorted(f2))
    np.testing.assert_allclose(b1, b2, atol=1e-5)
