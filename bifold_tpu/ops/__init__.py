"""Jittable math + Pallas kernels: the TPU compute substrate of bifold-tpu."""

from bifold_tpu.ops import augment, depth, gaussmap, geometry, heatmap, image

__all__ = ["augment", "depth", "gaussmap", "geometry", "heatmap", "image"]
