"""BC trainer family + diffusion BC + representation zoo tests."""
import numpy as np
import pytest

from real_robot_nerf_actor_tpu.data.demos import (
    KeyframeBuffer, generate_demonstrations, generate_nerf_scene,
    simple_motion_planning)
from real_robot_nerf_actor_tpu.models.representations import (
    make_embedding, probe_out_dim)
from real_robot_nerf_actor_tpu.train.bc import BCConfig, BCTrainer


def test_scripted_expert_collects_lift_demos():
    trajs = generate_demonstrations("lift", n_demos=2, obs_mode="state",
                                    episode_length=60, seed=0)
    assert len(trajs) == 2
    assert all(t.success for t in trajs)


def test_keyframe_buffer_and_motion_planning():
    trajs = generate_demonstrations("lift", n_demos=1, obs_mode="state",
                                    episode_length=60, seed=0)
    buf = KeyframeBuffer()
    buf.add_trajectory(trajs[0])
    assert len(buf) >= 2
    path = simple_motion_planning(np.zeros(3), np.ones(3), n_steps=4)
    assert path.shape == (4, 3)
    np.testing.assert_allclose(path[-1], 1.0)


def test_nerf_scene_generation():
    sc = generate_nerf_scene("lift", n_views=4, image_size=24, seed=0)
    assert sc.images.shape == (4, 24, 24, 3)
    assert sc.poses.shape == (4, 4, 4)
    assert sc.images.max() > 0
    # each view sees something different
    assert np.abs(sc.images[0] - sc.images[2]).max() > 0.01


@pytest.mark.parametrize("name,obs", [
    ("zero", np.zeros((2, 8, 8, 3), np.float32)),
    ("simple", np.zeros((2, 16, 16, 3), np.float32)),
    ("resnet18", np.zeros((2, 16, 16, 3), np.float32)),
    ("pointnet", np.zeros((2, 100, 3), np.float32)),
    ("pointnet2", np.random.rand(2, 100, 3).astype(np.float32)),
])
def test_representation_zoo(name, obs):
    emb = make_embedding(name, out_dim=16 if name == "zero" else None)
    dim = probe_out_dim(emb, obs)
    assert dim > 0


def test_bc_state_mlp_learns():
    trajs = generate_demonstrations("lift", n_demos=2, obs_mode="state",
                                    episode_length=60, seed=0)
    obs0 = trajs[0].observations[0]
    cfg = BCConfig(embedding="zero", obs_mode="state", hidden_dim=64,
                   batch_size=32, lr=1e-3)
    # state obs: use identity-ish embedding via 'zero'? no — use the obs
    # directly through a pointnet-free path: wrap state in 'simple'? Use a
    # dedicated trainer with the state fed as features via 'zero' is wrong;
    # use embedding='state' passthrough below.
    tr = StatePassthroughBC(obs0, action_dim=4)
    losses = tr.fit(trajs, epochs=30)
    assert losses[-1] < losses[0]


class StatePassthroughBC(BCTrainer):
    """State obs -> identity embedding (covers the reference's state-BC)."""

    def __init__(self, obs_example, action_dim=4, seed=0):
        import dataclasses as dc
        from real_robot_nerf_actor_tpu.models.representations import Embedding
        import jax.numpy as jnp
        cfg = BCConfig(embedding="simple", obs_mode="state",
                       action_dim=action_dim, hidden_dim=64, batch_size=32,
                       lr=1e-3)
        self.cfg = cfg
        self.embedding = Embedding("state", None, int(np.prod(obs_example.shape)),
                                   apply_fn=lambda v, o: jnp.asarray(o))
        self.enc_vars = {}
        import jax, optax
        from real_robot_nerf_actor_tpu.train.bc import ContinuousPolicy
        self.policy = ContinuousPolicy(action_dim, cfg.hidden_dim)
        self.pol_params = self.policy.init(
            jax.random.key(seed), jnp.asarray(obs_example)[None])["params"]
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init((self.pol_params, self.enc_vars))
        self._jit_update = jax.jit(self._mlp_update)
        self._jit_act = jax.jit(self._mlp_act)
        self._rng = np.random.default_rng(seed)


def test_bc_image_and_keyframe_modes():
    trajs = generate_demonstrations("lift", n_demos=1, obs_mode="image",
                                    image_size=16, episode_length=60, seed=0)
    obs0 = trajs[0].observations[0]
    cfg = BCConfig(embedding="simple", obs_mode="image", hidden_dim=32,
                   batch_size=16, keyframe_mode=True)
    tr = BCTrainer(cfg, obs0)
    losses = tr.fit(trajs, epochs=4)
    assert np.isfinite(losses).all()
    a = tr.act(obs0)
    assert a.shape == (4,)


def test_bc_diffusion_head():
    from real_robot_nerf_actor_tpu.rl.diffusion_bc import (
        DiffusionBC, DiffusionBCConfig)
    bc = DiffusionBC(DiffusionBCConfig(obs_dim=5, action_dim=3,
                                       hidden_dim=32, n_timesteps=10))
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((64, 5)).astype(np.float32)
    target = np.tanh(obs[:, :3]).astype(np.float32)
    losses = [bc.update(obs, target) for _ in range(30)]
    assert losses[-1] < losses[0]
    a = bc.sample_action(obs[0])
    assert a.shape == (3,) and (np.abs(a) <= 1).all()


def test_bc_pointcloud_mode():
    """bc_depth equivalent: pointnet embedding over point-cloud obs."""
    rng = np.random.default_rng(0)
    obs0 = {"points": rng.standard_normal((200, 3)).astype(np.float32),
            "colors": rng.uniform(0, 1, (200, 3)).astype(np.float32)}

    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models.representations import Embedding
    from real_robot_nerf_actor_tpu.models.representations import PointNet
    m = PointNet(32)
    emb = Embedding("pointnet_pc", m, 32,
                    apply_fn=lambda v, o: m.apply(
                        v, jnp.concatenate([o["points"], o["colors"]], -1)))
    cfg = BCConfig(embedding="pointnet", obs_mode="pointcloud", hidden_dim=32,
                   batch_size=8)
    tr = BCTrainer.__new__(BCTrainer)
    tr.cfg = cfg
    tr.embedding = emb
    import jax
    import optax
    from real_robot_nerf_actor_tpu.train.bc import ContinuousPolicy, _batch_one
    ob1 = _batch_one(obs0)
    tr.enc_vars = m.init(jax.random.key(0), jnp.concatenate(
        [jnp.asarray(ob1["points"]), jnp.asarray(ob1["colors"])], -1))
    feat = emb(tr.enc_vars, ob1)
    tr.policy = ContinuousPolicy(4, 32)
    tr.pol_params = tr.policy.init(jax.random.key(1), feat)["params"]
    tr.tx = optax.adam(1e-3)
    tr.opt_state = tr.tx.init((tr.pol_params, tr.enc_vars))
    tr._jit_update = jax.jit(tr._mlp_update)
    tr._jit_act = jax.jit(tr._mlp_act)
    tr._rng = np.random.default_rng(0)

    obs_b = {k: np.stack([obs0[k]] * 8) for k in obs0}
    act_b = np.tanh(rng.standard_normal((8, 4))).astype(np.float32)
    losses = [tr.update(obs_b, act_b) for _ in range(15)]
    assert losses[-1] < losses[0]
    a = tr.act(obs0)
    assert a.shape == (4,)


def test_sac_pixel_update():
    from real_robot_nerf_actor_tpu.rl import SACAgent, SACConfig, ReplayBuffer
    rng = np.random.default_rng(0)
    obs = rng.uniform(0, 1, (10, 10, 3)).astype(np.float32)
    cfg = SACConfig(action_dim=2, obs_type="image", hidden_dim=32,
                    encoder_feature_dim=8)
    agent = SACAgent(cfg, obs)
    rb = ReplayBuffer(100, obs.shape, 2)
    for _ in range(40):
        rb.add(rng.uniform(0, 1, obs.shape).astype(np.float32),
               rng.uniform(-1, 1, 2).astype(np.float32), 0.5,
               rng.uniform(0, 1, obs.shape).astype(np.float32), False)
    m1 = agent.update(rb.sample(16))
    m2 = agent.update(rb.sample(16))
    assert np.isfinite(m1["critic_loss"]) and np.isfinite(m2["critic_loss"])


def test_bc_state_embedding_registry():
    """embedding='state' (round 4): identity passthrough wired into the
    registry so state-obs BC needs no subclass workaround."""
    trajs = generate_demonstrations("push", n_demos=2, obs_mode="state",
                                    episode_length=60, seed=0)
    cfg = BCConfig(embedding="state", obs_mode="state", hidden_dim=32,
                   batch_size=16, lr=1e-3)
    tr = BCTrainer(cfg, trajs[0].observations[0], seed=0)
    losses = tr.fit(trajs, epochs=20)
    assert losses[-1] < losses[0]
    a = tr.act(trajs[0].observations[0])
    assert a.shape == (4,)
