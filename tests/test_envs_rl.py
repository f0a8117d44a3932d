"""Sim env suite + SAC + replay buffer tests."""
import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")
gym = pytest.importorskip("gymnasium")

from real_robot_nerf_actor_tpu.envs import make_env, TASK_REGISTRY
from real_robot_nerf_actor_tpu.rl import (
    SACConfig, SACAgent, ReplayBuffer, PrioritizedReplayBuffer)


@pytest.mark.parametrize("task", sorted(TASK_REGISTRY))
def test_all_tasks_step(task):
    env = make_env(task_name=task, obs_mode="state", episode_length=5)
    obs, info = env.reset(seed=0)
    assert np.isfinite(obs).all()
    for _ in range(5):
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        assert np.isfinite(obs).all() and np.isfinite(r)
    assert trunc  # TimeLimit fires at 5


def test_image_obs_and_camera_info():
    env = make_env(task_name="lift", obs_mode="image", image_size=24,
                   frame_stack=2, camera_info=True)
    obs, info = env.reset(seed=1)
    assert obs.shape == (24, 24, 6)
    assert obs.max() > 0  # renderer produced something
    assert info["cam_intrinsic"].shape == (3, 3)
    assert info["cam_extrinsic"].shape == (4, 4)


def test_pointcloud_obs():
    env = make_env(task_name="push", obs_mode="pointcloud", image_size=24,
                   cameras=("front", "side"))
    obs, _ = env.reset(seed=0)
    assert obs["points"].shape[0] > 100
    assert obs["points"].shape == obs["colors"].shape


def test_dynamic_camera_moves():
    env = make_env(task_name="reach", obs_mode="image", image_size=16,
                   dynamic_camera=True, cameras=("dynamic",), camera_info=False)
    env.reset(seed=0)
    base = env.unwrapped
    p0 = base.camera_extrinsic("dynamic")[:3, 3].copy()
    env.step(env.action_space.sample())
    p1 = base.camera_extrinsic("dynamic")[:3, 3].copy()
    assert np.linalg.norm(p1 - p0) > 1e-3


def test_replay_buffers():
    rb = ReplayBuffer(100, (4,), 2)
    for i in range(150):
        rb.add(np.ones(4) * i, np.zeros(2), float(i), np.ones(4), i % 10 == 0)
    assert len(rb) == 100
    b = rb.sample(32)
    assert b["obs"].shape == (32, 4) and (b["weights"] == 1).all()

    per = PrioritizedReplayBuffer(100, (4,), 2)
    for i in range(50):
        per.add(np.ones(4) * i, np.zeros(2), float(i), np.ones(4), False)
    b = per.sample(16)
    per.update_priorities(b["idx"], np.random.rand(16) * 10)
    b2 = per.sample(16)
    assert (b2["weights"] <= 1.0 + 1e-6).all()


def test_sac_state_learns_shapes():
    env = make_env(task_name="reach", obs_mode="state", episode_length=10)
    obs, _ = env.reset(seed=0)
    cfg = SACConfig(action_dim=int(np.prod(env.action_space.shape)),
                    obs_type="state", hidden_dim=32)
    agent = SACAgent(cfg, obs, seed=0)
    rb = ReplayBuffer(500, obs.shape, cfg.action_dim)
    for _ in range(60):
        a = agent.sample_action(obs)
        assert a.shape == (cfg.action_dim,)
        assert (np.abs(a) <= 1.0 + 1e-5).all()
        next_obs, r, term, trunc, _ = env.step(a)
        rb.add(obs, a, r, next_obs, term)
        obs = next_obs if not (term or trunc) else env.reset()[0]
    m = agent.update(rb.sample(32))
    m2 = agent.update(rb.sample(32))
    assert np.isfinite(m["critic_loss"])
    assert "actor_loss" in m or "actor_loss" in m2


def test_sac_pixel_encoder():
    import jax.numpy as jnp
    cfg = SACConfig(action_dim=2, obs_type="image", hidden_dim=32,
                    encoder_feature_dim=16)
    obs = np.random.rand(12, 12, 3).astype(np.float32)
    agent = SACAgent(cfg, obs, seed=0)
    a = agent.select_action(obs)
    assert a.shape == (2,)
