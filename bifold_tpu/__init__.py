"""bifold-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of BiFold.

Language-conditioned bimanual cloth-folding action prediction: dual-encoder
vision-language backbone, cross-modal fusion transformer, per-arm pick/place
heatmap decoders — built from scratch for TPU (SPMD over a jax.sharding.Mesh,
Pallas kernels on the hot paths, on-device data transforms).
"""

__version__ = "0.1.0"
