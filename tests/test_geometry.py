"""Geometry tests: depth→mesh reconstruction + PLY round trip."""

import numpy as np

from materialist_tpu.geometry.mesh_recon import (default_intrinsics,
                                                 depth_to_mesh,
                                                 rotate_mesh_around_x)
from materialist_tpu.geometry.ply import read_ply, write_ply


def test_flat_plane_mesh():
    depth = np.full((16, 16), 2.0, np.float32)
    v, f, b = depth_to_mesh(depth, min_angle=6.0)
    assert len(v) >= 256
    # flat plane facing camera: all quads valid, 2 tris each
    assert len(f) == 2 * 15 * 15
    assert len(b) == 0
    # all points at z = 2 (o3d convention: +z in front before rotation)
    np.testing.assert_allclose(v[:256, 2], 2.0, atol=1e-5)


def test_depth_step_creates_boundary():
    depth = np.full((32, 32), 2.0, np.float32)
    depth[:, 16:] = 4.0  # occlusion edge down the middle
    v, f, b = depth_to_mesh(depth, min_angle=6.0)
    assert len(b) > 0  # boundary points detected at the step
    # duplicated vertices appended beyond the pixel grid
    assert len(v) > 32 * 32


def test_rotation_convention():
    v = np.array([[1.0, 2.0, 3.0]], np.float32)
    out = rotate_mesh_around_x(v, 180.0)
    np.testing.assert_allclose(out, [[1.0, -2.0, -3.0]], atol=1e-6)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.random((100, 3)).astype(np.float32)
    f = rng.integers(0, 100, (50, 3)).astype(np.int32)
    p = str(tmp_path / "m.ply")
    write_ply(p, v, f)
    rv, rf = read_ply(p)
    np.testing.assert_array_equal(rv, v)
    np.testing.assert_array_equal(rf, f.astype(np.uint32))


def test_mesh_unprojection_matches_intrinsics():
    depth = np.full((8, 8), 3.0, np.float32)
    K = default_intrinsics(8, 8)
    v, _, _ = depth_to_mesh(depth, min_angle=0.5)
    # center pixel ~ (cx, cy) maps to ray through origin: x≈y≈0
    center = v[: 64].reshape(8, 8, 3)
    # pixel (4,4) offset from center (3.5,3.5) by 0.5 px
    f = K[0, 0]
    np.testing.assert_allclose(center[4, 4, 0], 0.5 * 3.0 / f, rtol=1e-4)
