"""Host-side dataset helpers: camera constants, masks, point-cloud graph ops.

Counterpart of /root/reference/bifold/data/utils.py. The open3d voxel
downsample the reference uses is replaced by a numpy grid-hash voxelizer with
identical centroid semantics, so the graph pipeline has no open3d dependency.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

__all__ = [
    "DENG_CAMERA_PARAMS",
    "get_mask_from_depth",
    "voxelize_pointcloud",
    "fps",
    "compute_edge_attr",
]

# Camera of the unimanual (Deng et al. language_deformable) sim data
# (reference data/utils.py:8-15).
DENG_CAMERA_PARAMS = {
    "default_camera": {
        "pos": np.array([-0.0, 0.65, 0.0]),
        "angle": np.array([0, -np.pi / 2.0, 0.0]),
        "width": 720,
        "height": 720,
    }
}


def get_mask_from_depth(depth: np.ndarray, threshold: float = 0.996) -> np.ndarray:
    """Cloth mask for the unimanual sim data (reference data/utils.py:18-23):
    far pixels (> threshold, the background plane) and empty pixels
    (depth == 0) are background; everything else is cloth."""
    return ((depth <= threshold) & (depth != 0)).astype(np.float32)


def voxelize_pointcloud(pointcloud: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid downsample: mean of the points in each occupied voxel
    (open3d ``voxel_down_sample`` semantics, reference data/utils.py:69-73)."""
    if len(pointcloud) == 0:
        return pointcloud
    keys = np.floor(pointcloud / voxel_size).astype(np.int64)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    sums = np.zeros((len(counts), pointcloud.shape[1]), dtype=np.float64)
    np.add.at(sums, inverse, pointcloud)
    return (sums / counts[:, None]).astype(pointcloud.dtype)


def fps(pts: np.ndarray, k: int) -> np.ndarray:
    """Farthest-point sampling of ``k`` points (reference data/utils.py:76-87).
    Deterministic: starts from point 0. Returns all points when fewer than k."""
    if len(pts) <= k:
        return pts
    selected = np.zeros(k, dtype=np.int64)
    dists = np.full(len(pts), np.inf)
    farthest = 0
    for i in range(k):
        selected[i] = farthest
        d = np.linalg.norm(pts - pts[farthest], axis=1)
        dists = np.minimum(dists, d)
        farthest = int(np.argmax(dists))
    return pts[selected]


def compute_edge_attr(vox_pc: np.ndarray, neighbor_radius: float):
    """Radius-graph edges + relative-displacement/distance edge attributes
    (reference data/utils.py:35-66): undirected pairs within
    ``neighbor_radius``, each emitted in both directions."""
    point_tree = cKDTree(vox_pc)
    undirected = np.array(list(point_tree.query_pairs(neighbor_radius)),
                          dtype=np.int64)
    if len(undirected) == 0:
        edges = np.zeros((2, 0), dtype=np.int64)
        edge_attr = np.zeros((0, 4), dtype=np.float32)
        return edges, edge_attr
    senders = np.concatenate([undirected[:, 0], undirected[:, 1]])
    receivers = np.concatenate([undirected[:, 1], undirected[:, 0]])
    edges = np.stack([senders, receivers])
    disp = vox_pc[receivers] - vox_pc[senders]
    dist = np.linalg.norm(disp, axis=1, keepdims=True)
    edge_attr = np.concatenate([disp, dist], axis=1).astype(np.float32)
    return edges, edge_attr
