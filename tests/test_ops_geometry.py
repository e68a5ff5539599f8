"""Golden tests of camera geometry vs reference-style numpy math."""

import numpy as np
import pytest

from bifold_tpu.ops import geometry as G


def _ref_rotation_matrix(angle, axis):
    # Independent reimplementation of softgym_utils.get_rotation_matrix semantics
    axis = np.asarray(axis) / np.linalg.norm(axis)
    s, c = np.sin(angle), np.cos(angle)
    x, y, z = axis
    m = np.eye(4)
    m[0, :3] = [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s]
    m[1, :3] = [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s]
    m[2, :3] = [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c]
    return m


def test_intrinsics_square_45_fov():
    K = G.intrinsic_from_fov(720, 720, 45)
    # fx = w / (2 tan(fov/2))
    assert K[0, 0] == pytest.approx(720 / (2 * np.tan(np.deg2rad(45) / 2)))
    assert K[0, 2] == 360 and K[1, 2] == 360
    assert K[0, 0] == pytest.approx(K[1, 1])


def test_rotation_matrix_matches_reference_convention():
    for angle, axis in [(0.3, [0, 1, 0]), (-1.2, [1, 0, 0]), (2.0, [0.3, 0.5, 0.8])]:
        np.testing.assert_allclose(
            G.rotation_matrix_4x4(angle, axis), _ref_rotation_matrix(angle, axis), atol=1e-12
        )


def test_world_to_camera_roundtrip():
    m = G.matrix_world_to_camera([0.0, 0.65, 0.0], [np.pi / 2, -np.pi / 6])
    # valid rigid transform
    R = m[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    assert np.linalg.det(R) == pytest.approx(1.0)


def test_pixel_world_roundtrip():
    h = w = 64
    K = G.intrinsic_from_fov(h, w, 45)
    m = G.matrix_world_to_camera([0.0, 0.65, 0.0], [np.pi / 2, -np.pi / 6])
    depth = np.full((h, w), 0.65, dtype=np.float32)
    px = np.array([20.0, 31.0])
    world = np.asarray(G.world_from_pixel(px, depth, m, K))
    back = np.asarray(G.pixel_from_world(world[None], m, K))  # (2, 1)
    np.testing.assert_allclose(back[:, 0], px, atol=1e-3)


def test_world_coords_from_depth_consistent_with_single_pixel():
    h = w = 32
    K = G.intrinsic_from_fov(h, w, 45)
    m = G.matrix_world_to_camera([0.1, 0.8, -0.2], [0.7, -0.5])
    rng = np.random.default_rng(0)
    depth = rng.uniform(0.4, 0.9, size=(h, w)).astype(np.float32)
    all_coords = np.asarray(G.world_coords_from_depth(depth, m, K))
    # Reference's single-pixel unprojector indexes depth[x, y]; the dense map is
    # laid out [row=v, col=u], so compare pixel [x=u, y=v] against [v, u] — but
    # world_from_pixel uses depth[round(x), round(y)], i.e. transposed indexing.
    u, v = 5, 9
    single = np.asarray(G.world_from_pixel(np.array([u, v]), depth.T, m, K))
    np.testing.assert_allclose(single, all_coords[v, u, :3], rtol=1e-5, atol=1e-5)
