from real_robot_nerf_actor_tpu.parallel.mesh import (
    make_mesh, MeshSpec, shard_batch, shard_rays, replicate, data_parallel_shardings)
from real_robot_nerf_actor_tpu.parallel.constraints import (
    tensor_parallel, shard_hidden, replicated)
