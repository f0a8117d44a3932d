"""real_robot_nerf_actor_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of geyan21/Real-Robot-Nerf-Actor.

This is a from-scratch redesign, not a port: the compute path is pure
functional JAX compiled by XLA for TPU (MXU matmuls, fused elementwise,
static shapes), models are Flax modules, parallelism is expressed with
`jax.sharding.Mesh` + NamedSharding instead of chunk loops / DataParallel,
and the hot kernels (cross-attention, trilinear voxel sampling) have Pallas
implementations.

Layer map (mirrors SURVEY.md §7):
  ops/       pure array ops: voxelize, rays, sampling, compositing,
             grid-sample, action codec, SE(3) aug, spatial softmax
  models/    Flax modules: PerceiverIO voxel policy, ResnetFC, NeRF field,
             conv blocks, DINO ViT, CLIP text tower
  render/    NeuralRenderer: coarse/fine volume rendering + losses
  data/      replay-first datasets: PLY loader, keyframe poses, synthetic
             scenes, robot-IO replay stubs
  train/     unified Trainer + drivers (peract / nerfact / featurenerf)
  parallel/  device mesh + sharding specs (dp over batch, sp over rays)
  envs/      simulation environments (MuJoCo xArm task suite)
  utils/     logging, profiling, config
"""

__version__ = "0.1.0"
