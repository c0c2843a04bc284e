"""cpcsv_tpu — TPU-native re-build of CP-CSV story visualization.

A from-scratch JAX/Flax/Pallas framework with the capabilities of
``basiclab/CPCStoryVisualization-Pytorch`` ("Character-Preserving Coherent
Story Visualization", ECCV 2020): a conditional story-GAN that turns a
5-sentence story (precomputed text embeddings) into 5 coherent 64x64 frames,
with a figure-ground segmentation branch, cascade seg-autoencoder gating,
three conditional discriminators, and a Frechet-distance evaluation suite
(FID / FSD / FVD / SSIM / IS).

Design notes (TPU-first, not a port):
  * NHWC layouts, bf16-capable compute path, static shapes, `lax.scan`
    for the temporal GRU unrolls.
  * The reference's per-sample dynamic-filter conv1d python loop
    (reference `layers.py:62-80`) is a single batched einsum / Pallas kernel.
  * Data-parallelism is a `jax.sharding.Mesh` + jit with NamedSharding,
    replacing the reference's `nn.parallel.data_parallel` scatter/gather.
"""

__version__ = "0.1.0"

from cpcsv_tpu.config import Config, config_from_file, default_config

__all__ = ["Config", "config_from_file", "default_config", "__version__"]
