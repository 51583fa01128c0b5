"""adaptive_stereo_tpu: a TPU-native online-adaptive stereo depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
miloknowles/adaptive-stereo-icra-2021 ("Toward Robust and Efficient Online
Adaptation for Deep Stereo Depth Estimation", ICRA 2021):

- StereoNet (Khamis et al. 2018): siamese feature extraction, difference cost
  volume, 3D-conv aggregation, soft-argmin regression, edge-aware refinement.
- Online adaptation: self-supervised monodepth loss, Feature Contrast Score
  OOD gating, online validation set (reservoir sampling), experience replay,
  DONE/IN_PROGRESS state machine.
- TPU-first: everything hot is one jitted XLA program (forward + loss + grad +
  Adam); Pallas kernels for cost-volume build and fused soft-argmin/FCS;
  multi-chip scale-out via jax.sharding.Mesh with psum gradient reduction.

Layout:
  ops/      pure functional numerics (jnp reference impls + Pallas kernels)
  models/   flax.linen model definitions + torch checkpoint importer
  data/     split-file datasets, image/disparity IO, prefetch pipeline
  engine/   supervised trainer, online adaptation engine, evaluation
  parallel/ device mesh, sharded fleet adaptation
  serving/  stream-ingest inference loop (ROS-node-shaped API)
  analysis/ OOD/FCS analysis, results pipeline, timing benchmarks
"""

__version__ = "0.1.0"
