"""hotrack_tpu — a TPU-native (JAX / XLA / Pallas) hand–object tracking framework.

A from-scratch rebuild of the capabilities of PKU-EPIC/HOTrack ("Tracking and
Reconstructing Hand Object Interactions from Point Cloud Sequences in the Wild",
AAAI 2023): HandTrackNet keypoint tracking, IKNet MANO inverse kinematics,
gradient-free particle optimizers for object 6-DoF pose (vs. DeepSDF shape codes)
and MANO hand pose, on SimGrasp / HO3D / DexYCB point-cloud sequences.

Design: one functional JAX core — every compute path is jittable; per-frame
tracking is a `lax.scan`; particle optimizers are fixed-iteration `fori_loop`
bodies; point-cloud ops (FPS / knn / ball query / grouping / interpolation) are
XLA-native with Pallas-fused hot kernels; sequences batch/shard across chips via
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
