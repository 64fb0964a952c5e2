"""STiL-TTA TPU: a TPU-native JAX framework for semi-supervised
tabular-image learning with test-time adaptation.

Re-implements the capabilities of kgutjahr/STiL-TTA (CVPR 2025 STiL fork)
as an idiomatic JAX/XLA/Pallas framework:

- Flax model zoo: ResNet family, BERT-style tabular transformer, SAINT,
  disentangled (DCC) fusion backbones with multimodal/imaging/tabular heads.
- Algorithms: STiL (CGPL + PGLS), SimMatch, CoMatch, FreeMatch, MMatch,
  Co-Training (image-only and multimodal variants, SAINT variants).
- One fused jitted train step per algorithm: student + EMA teacher forward,
  pseudo-labeling, the full loss graph, optimizer + EMA + prototype updates.
- On-device data augmentation (crop/resize as MXU matmuls, jitter/blur on
  the VPU) and HBM-resident dataset caching.
- SPMD data parallelism over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
