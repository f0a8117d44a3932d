"""Eval metrics, NeRF extraction tools, visualizers."""
import os

import numpy as np

from real_robot_nerf_actor_tpu.eval import (
    extract_mesh, extract_nerf_pointcloud, mse_np, psnr_np,
    sigma_threshold_search, ssim_np)
from real_robot_nerf_actor_tpu.eval.extract import sample_sigma_grid
from real_robot_nerf_actor_tpu.utils.visualize import (
    save_render_panel, visualize_voxel_grid)


def test_metrics():
    a = np.random.default_rng(0).uniform(0, 1, (32, 32, 3))
    assert psnr_np(a, a) == 100.0
    assert abs(psnr_np(a, np.clip(a + 0.1, 0, 1)) - 20.0) < 3.0
    assert ssim_np(a, a) > 0.999
    assert ssim_np(a, 1 - a) < 0.5
    assert mse_np(a, a) == 0.0


def test_sigma_threshold_search_band():
    rng = np.random.default_rng(1)
    sig = rng.exponential(1.0, 200000)
    t = sigma_threshold_search(sig, 50000, 70000)
    n = (sig > t).sum()
    assert 49000 <= n <= 71000


def test_extract_nerf_pointcloud():
    rng = np.random.default_rng(2)
    n = 100000
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    sig = rng.exponential(1.0, n).astype(np.float32)
    emb = rng.standard_normal((n, 8)).astype(np.float32)
    base = np.eye(4)
    base[:3, 3] = [1, 0, 0]
    out = extract_nerf_pointcloud(pts, rgb, sig, emb, base_from_world=base,
                                  target_min=20000, target_max=30000)
    assert 15000 <= out["points"].shape[0] <= 35000
    assert out["embeds"].shape[1] == 8
    # base transform applied
    assert out["points"][:, 0].mean() > 0.5


def test_extract_mesh_sphere():
    r = np.linspace(-1, 1, 32)
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    sigma = 1.0 - np.sqrt(gx**2 + gy**2 + gz**2)  # >0 inside unit sphere
    verts, faces = extract_mesh(sigma, 0.5, origin=(-1, -1, -1),
                                spacing=(2 / 31,) * 3)
    assert verts.shape[0] > 50
    radii = np.linalg.norm(verts, axis=1)
    assert abs(radii.mean() - 0.5) < 0.1


def test_sample_sigma_grid():
    bounds = np.array([0, 0, 0, 1, 1, 1.0])
    grid = sample_sigma_grid(lambda p: p[:, 0], bounds, resolution=8)
    assert grid.shape == (8, 8, 8)
    np.testing.assert_allclose(grid[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(grid[-1], 1.0, atol=1e-6)


def test_visualizers(tmp_path):
    vox = np.zeros((10, 10, 10, 10), np.float32)
    vox[4:6, 4:6, 4:6, -1] = 1.0
    vox[4:6, 4:6, 4:6, 3:6] = 0.5
    p1 = str(tmp_path / "vox.png")
    visualize_voxel_grid(vox, gt_action=[5, 5, 5], pred_action=[4, 4, 4],
                         save_path=p1)
    assert os.path.getsize(p1) > 1000

    p2 = str(tmp_path / "panel.png")
    rng = np.random.default_rng(0)
    save_render_panel(p2, rng.uniform(0, 1, (16, 16, 3)),
                      rng.uniform(0, 1, (16, 16, 3)),
                      depth=rng.uniform(1, 2, (16, 16)),
                      embed=rng.standard_normal((16, 16, 8)), psnr=21.2)
    assert os.path.getsize(p2) > 1000


def test_video_recorder(tmp_path):
    from real_robot_nerf_actor_tpu.utils.video import VideoRecorder
    vr = VideoRecorder(str(tmp_path), fps=5)
    vr.init()
    for i in range(4):
        vr.record_frame(np.full((8, 8, 3), i * 60, np.uint8))
    p = vr.save("ep0")
    assert p and os.path.getsize(p) > 100
    p2 = vr.save_frames_npz("ep0")
    assert np.load(p2)["frames"].shape == (4, 8, 8, 3)


def test_nerfact_render_eval(tmp_path):
    import jax
    from tests.test_train import tiny_peract, _truncate_points, BOUNDS
    from real_robot_nerf_actor_tpu.models import PerceiverConfig
    from real_robot_nerf_actor_tpu.models.nerf_field import NerfFieldConfig
    from real_robot_nerf_actor_tpu.ops import VoxelizerSpec
    from real_robot_nerf_actor_tpu.render import RendererConfig
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.train.trainer import OptimConfig, TrainConfig
    cfg = NerfActConfig(
        peract=tiny_peract().__class__(
            model=PerceiverConfig(depth=1, voxel_size=10, num_latents=8,
                                  latent_dim=16, im_channels=8,
                                  cross_dim_head=8, latent_dim_head=8,
                                  latent_heads=1, voxel_patch_size=5,
                                  final_dim=8, lang_emb_dim=8,
                                  lang_max_seq_len=4,
                                  input_encoder="unet",
                                  return_voxel_feat=True),
            voxelizer=VoxelizerSpec(voxel_size=10, feature_size=3,
                                    max_num_coords=1500),
            coord_bounds=BOUNDS,
            train=TrainConfig(num_steps=1, optim=OptimConfig(lr=1e-3))),
        renderer=RendererConfig(
            image_width=8, image_height=6, n_coarse=4, n_fine=2,
            n_fine_depth=0, ray_chunk_size=8, render_tile=16,
            field=NerfFieldConfig(d_latent=8, d_embed=4, d_hidden=16,
                                  n_blocks=2, combine_layer=1,
                                  coord_bounds=BOUNDS)))
    tr = NerfActTrainer(cfg)
    state = tr.init_state(jax.random.key(0))
    batch = next(tr.synthetic_data(batch_size=1))
    batch = {k: (v[:, :1500] if k in ("points", "colors", "valid") else v)
             for k, v in batch.items()}
    m = tr.render_eval(state, 1, batch=batch, save_dir=str(tmp_path))
    assert np.isfinite(m["eval_psnr"])
    assert os.path.exists(str(tmp_path / "render_000001.png"))
