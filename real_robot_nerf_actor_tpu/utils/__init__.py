from real_robot_nerf_actor_tpu.utils.logger import Logger, AverageMeter
from real_robot_nerf_actor_tpu.utils.profiling import named_scope, StepTimer
