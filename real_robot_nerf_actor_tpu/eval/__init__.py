from real_robot_nerf_actor_tpu.eval.metrics import psnr_np, ssim_np, mse_np
from real_robot_nerf_actor_tpu.eval.extract import (
    extract_nerf_pointcloud, sigma_threshold_search, extract_mesh)
