from real_robot_nerf_actor_tpu.render.renderer import (
    NeuralRenderer, OccupancyState, RendererConfig, psnr)
