"""eao_fusion_tpu — a TPU-native object-level SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of EAO-Fusion
(an ORB-SLAM2 / EAO-SLAM derivative; see SURVEY.md): ORB feature tracking,
RGBD mapping with local/global bundle adjustment, BoW loop closing and
relocalization, plane landmarks (PEAC-style segmentation) as optimization
factors, detector-driven cuboid/quadric object landmarks with ensemble data
association, and IMU-gravity world alignment.

Design principles (TPU-first, not a port):
  * Functional map state: one pytree of fixed-capacity arrays + validity
    masks; no pointer graphs, no mutexes. `step` functions are pure.
  * Compute as batched/vmapped JAX on MXU/VPU; Pallas kernels for hot ops.
  * Matching = masked matmul scoring (±1-bit descriptors on the MXU),
    not per-bucket scalar loops.
  * Solvers = batched Gauss-Newton/LM with dense-blocked sparse Schur
    complement, shardable over a `jax.sharding.Mesh` for distributed BA.
"""

__version__ = "0.1.0"

from eao_fusion_tpu.config import SystemConfig, CameraConfig, ORBConfig  # noqa: F401
