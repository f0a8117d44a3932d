from real_robot_nerf_actor_tpu.rl.sac import SACConfig, SACAgent
from real_robot_nerf_actor_tpu.rl.replay import ReplayBuffer, PrioritizedReplayBuffer
