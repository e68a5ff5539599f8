"""Camera geometry: intrinsics, world<->camera<->pixel transforms.

Jittable JAX counterparts of the reference's numpy camera math
(/root/reference/bifold/env/softgym_utils.py:1-90 and
/root/reference/bifold/data/processor.py:386-488). Pixel convention follows
the reference: action pixels are ``[x, y]`` (column, row), and
``world_from_pixel`` indexes the depth map as ``depth[round(x), round(y)]`` —
a reference quirk kept for closed-loop parity (processor.py:395-396).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "intrinsic_from_fov",
    "rotation_matrix_4x4",
    "matrix_world_to_camera",
    "world_from_pixel",
    "world_coords_from_depth",
    "pixel_from_world",
]


def intrinsic_from_fov(height: int, width: int, fov: float = 90.0) -> np.ndarray:
    """Pinhole intrinsics (4x4) from a horizontal field of view in degrees."""
    px, py = width / 2.0, height / 2.0
    hfov = fov / 360.0 * 2.0 * np.pi
    fx = width / (2.0 * np.tan(hfov / 2.0))
    vfov = 2.0 * np.arctan(np.tan(hfov / 2.0) * height / width)
    fy = height / (2.0 * np.tan(vfov / 2.0))
    return np.array(
        [[fx, 0, px, 0.0], [0, fy, py, 0.0], [0, 0, 1.0, 0.0], [0, 0, 0, 1.0]]
    )


def rotation_matrix_4x4(angle: float, axis) -> np.ndarray:
    """Axis-angle rotation as a 4x4 homogeneous matrix (Rodrigues form).

    Matches the reference's sign convention (softgym_utils.py:29-63), which is
    the transpose of the usual right-handed Rodrigues matrix (i.e. rotation by
    ``-angle``).
    """
    axis = np.asarray(axis, dtype=np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    s, c = np.sin(angle), np.cos(angle)
    m = np.eye(4)
    m[:3, :3] = np.array(
        [
            [x * x + (1 - x * x) * c, x * y * (1 - c) - z * s, x * z * (1 - c) + y * s],
            [x * y * (1 - c) + z * s, y * y + (1 - y * y) * c, y * z * (1 - c) - x * s],
            [x * z * (1 - c) - y * s, y * z * (1 - c) + x * s, z * z + (1 - z * z) * c],
        ]
    )
    return m


def matrix_world_to_camera(cam_pos, cam_angle) -> np.ndarray:
    """World->camera extrinsics from the SoftGym camera pose parameterization.

    ``cam_angle = (x_angle, y_angle)`` in radians: yaw about world-Y then pitch
    about camera-X, with the reference's extra pi flip (softgym_utils.py:14-27).
    """
    cam_x, cam_y, cam_z = cam_pos
    cam_x_angle, cam_y_angle = cam_angle[0], cam_angle[1]
    m1 = rotation_matrix_4x4(-cam_x_angle, [0, 1, 0])
    m2 = rotation_matrix_4x4(-cam_y_angle - np.pi, [1, 0, 0])
    rotation = m2 @ m1
    translation = np.eye(4)
    translation[:3, 3] = [-cam_x, -cam_y, -cam_z]
    return rotation @ translation


def world_from_pixel(pixel_xy, depth, m_world_to_camera, K):
    """Unproject one ``[x, y]`` pixel to a world-space 3-vector.

    Keeps the reference's indexing quirk ``z = depth[round(x), round(y)]``
    (processor.py:394-396) so closed-loop rollouts land on the same particle.
    Jittable; ``pixel_xy`` may be float.
    """
    pixel_xy = jnp.asarray(pixel_xy)
    depth = jnp.asarray(depth)
    K = jnp.asarray(K)
    u, v = pixel_xy[0], pixel_xy[1]
    ui = jnp.clip(jnp.rint(u).astype(jnp.int32), 0, depth.shape[0] - 1)
    vi = jnp.clip(jnp.rint(v).astype(jnp.int32), 0, depth.shape[1] - 1)
    z = depth[ui, vi]
    x = (u - K[0, 2]) * z / K[0, 0]
    y = (v - K[1, 2]) * z / K[1, 1]
    cam = jnp.array([1.0, 1.0, 1.0, 1.0], dtype=jnp.result_type(depth, jnp.float32))
    cam = cam.at[0].set(x).at[1].set(y).at[2].set(z)
    world = jnp.linalg.inv(jnp.asarray(m_world_to_camera)) @ cam
    return world[:3]


def world_coords_from_depth(depth, m_world_to_camera, K):
    """Back-project a full (H, W) depth map to (H, W, 4) homogeneous world coords."""
    depth = jnp.asarray(depth)
    K = jnp.asarray(K)
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[:, None]
    x = (u - K[0, 2]) * depth / K[0, 0]
    y = (v - K[1, 2]) * depth / K[1, 1]
    ones = jnp.ones_like(depth)
    cam = jnp.stack([x, y, depth, ones], axis=-1)
    m_cam_to_world = jnp.linalg.inv(jnp.asarray(m_world_to_camera))
    return jnp.einsum("ij,hwj->hwi", m_cam_to_world, cam)


def pixel_from_world(coords, m_world_to_camera, K):
    """Project (N, 3) world points to a (2, N) ``[u; v]`` pixel array
    (reference layout, processor.py:467-488)."""
    coords = jnp.asarray(coords)
    m = jnp.asarray(m_world_to_camera)
    K = jnp.asarray(K)
    homo = jnp.concatenate([coords, jnp.ones((coords.shape[0], 1), coords.dtype)], axis=1)
    cam = (m @ homo.T).T
    x, y, z = cam[:, 0], cam[:, 1], cam[:, 2]
    u = x * K[0, 0] / z + K[0, 2]
    v = y * K[1, 1] / z + K[1, 2]
    return jnp.stack([u, v])
