"""Sim episode -> keyframe PerAct batch pipeline (PerActDataset role)."""
import numpy as np
import jax
import pytest

from real_robot_nerf_actor_tpu.data.demos import generate_demonstrations
from real_robot_nerf_actor_tpu.data.episodes import (
    EpisodeDataset, load_trajectory, save_trajectory)

BOUNDS = (-0.6, -0.6, -0.05, 0.6, 0.6, 0.6)


@pytest.fixture(scope="module")
def pc_trajs():
    return generate_demonstrations("lift", n_demos=1, obs_mode="pointcloud",
                                   image_size=24, episode_length=60, seed=0)


def test_trajectory_npz_roundtrip(tmp_path, pc_trajs):
    p = str(tmp_path / "t0.npz")
    save_trajectory(p, pc_trajs[0])
    tr = load_trajectory(p)
    assert tr.success == pc_trajs[0].success
    assert len(tr.actions) == len(pc_trajs[0].actions)
    assert isinstance(tr.observations[0], dict)


def test_episode_dataset_batches_feed_peract(pc_trajs):
    ds = EpisodeDataset(pc_trajs, BOUNDS, voxel_size=10,
                        max_num_coords=2000, lang_shape=(4, 16))
    assert len(ds) >= 1
    b = next(ds.batches(batch_size=2, seed=0))
    assert b["points"].shape == (2, 2000, 3)
    assert b["rot_grip"].shape == (2, 4)
    assert b["kf_xyz"].shape == (2, 2, 3)

    # the batch drives a real PerAct train step
    from real_robot_nerf_actor_tpu.models import PerceiverConfig
    from real_robot_nerf_actor_tpu.ops import VoxelizerSpec
    from real_robot_nerf_actor_tpu.train import PerActConfig, PerActTrainer
    from real_robot_nerf_actor_tpu.train.trainer import OptimConfig, TrainConfig
    cfg = PerActConfig(
        model=PerceiverConfig(depth=1, voxel_size=10, num_latents=16,
                              latent_dim=32, im_channels=8, cross_dim_head=8,
                              latent_dim_head=8, latent_heads=2,
                              voxel_patch_size=5, final_dim=8,
                              lang_emb_dim=16, lang_max_seq_len=4),
        voxelizer=VoxelizerSpec(voxel_size=10, feature_size=3,
                                max_num_coords=2000),
        coord_bounds=BOUNDS,
        train=TrainConfig(num_steps=2, optim=OptimConfig(lr=1e-3)))
    tr = PerActTrainer(cfg)
    state = tr.init_state(jax.random.key(0))
    state, m = jax.jit(tr.train_step)(state, b, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
