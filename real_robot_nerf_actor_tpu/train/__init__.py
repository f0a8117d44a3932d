from real_robot_nerf_actor_tpu.train.trainer import (
    TrainConfig, OptimConfig, Trainer, TrainState)
from real_robot_nerf_actor_tpu.train.peract import (
    PerActConfig, PerActTrainer, bc_losses)
from real_robot_nerf_actor_tpu.train.nerfact import NerfActConfig, NerfActTrainer
