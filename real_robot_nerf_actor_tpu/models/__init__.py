from real_robot_nerf_actor_tpu.models.blocks import (
    Conv3DBlock,
    Conv3DUpsampleBlock,
    DenseBlock,
    MultiLayer3DEncoder,
    MultiLayer3DEncoderShallow,
)
from real_robot_nerf_actor_tpu.models.implicit import ImplicitNet
from real_robot_nerf_actor_tpu.models.resnetfc import ResnetFC
from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig, VoxelNerfField
from real_robot_nerf_actor_tpu.models.perceiver import PerceiverConfig, PerceiverIO
