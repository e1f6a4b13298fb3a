"""vista_slam_tpu: a TPU-native monocular dense SLAM framework.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the ViSTA-SLAM reference pipeline: a Symmetric Two-view Association (STA)
frontend (ViT encoder + cross-attention two-view decoder regressing per-pixel
3D pointmaps, confidences and a relative pose per image pair) feeding a Sim(3)
pose-graph backend with bag-of-words loop closure and optical-flow keyframing.

Layering (TPU-first, not a port):
  ops/       Pure-JAX and Pallas compute primitives: Sim(3) Lie group, RoPE2D,
             flash attention, batched Gauss-Newton/LM.
  models/    The STA frontend as flax modules + torch-checkpoint conversion.
  slam/      Online SLAM core: batched pair decoding, pose graph, PGO, loop
             closure, flow keyframing.
  datasets/  Eval-time sequence loaders and training view-graph datasets.
  eval/      Trajectory (ATE) and reconstruction (chamfer) evaluation.
  train/     Losses, data-parallel/tensor-parallel pjit training.
  parallel/  Mesh/sharding helpers.
  native/    Host-side C++ components (bag-of-words vocabulary).
  utils/     Config, geometry, image IO, logging, PLY export.
"""

__version__ = "0.2.0"
