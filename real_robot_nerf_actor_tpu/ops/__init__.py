from real_robot_nerf_actor_tpu.ops.geometry import (
    point_to_voxel_index,
    euler_to_quaternion,
    voxel_index_to_point,
)
from real_robot_nerf_actor_tpu.ops.rays import (
    unproj_map,
    gen_rays,
    positional_encoding,
    PositionalEncodingSpec,
)
from real_robot_nerf_actor_tpu.ops.action_codec import (
    discretize_action,
    one_hot_expert_actions,
    argmax_3d,
    choose_highest_action,
)
from real_robot_nerf_actor_tpu.ops.voxelize import VoxelizerSpec, voxelize
from real_robot_nerf_actor_tpu.ops.grid_sample import grid_sample_3d, sample_in_canonical_voxel
from real_robot_nerf_actor_tpu.ops.sampling import (
    sample_coarse,
    sample_fine,
    sample_fine_depth,
)
from real_robot_nerf_actor_tpu.ops.compositing import composite
from real_robot_nerf_actor_tpu.ops.se3_aug import apply_se3_augmentation
from real_robot_nerf_actor_tpu.ops.spatial_softmax import spatial_softmax_3d
