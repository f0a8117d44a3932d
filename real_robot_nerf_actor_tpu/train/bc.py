"""Behavior-cloning trainer family over the representation zoo.

Reference behavior: /root/reference/featurenerf_robo/src/train_bc*.py:
  - train_bc.py:        frozen/finetuned encoder + ContinuousPolicy, MSE on
                        expert actions, per-epoch env evaluation (success
                        rate over episodes)
  - train_bc_depth.py:  point-cloud input (pointnet encoders)
  - train_bc_fusion.py: 2D+3D fusion encoder
  - train_bc_keyframe:  keyframe BC + simple_motion_planning interpolation
  - train_bc_diffusion: DDPM policy head
All variants are one trainer parameterized by (embedding name, obs mode,
policy head) — data configs, not code copies.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from real_robot_nerf_actor_tpu.data.demos import (
    KeyframeBuffer, Trajectory, generate_demonstrations,
    simple_motion_planning)
from real_robot_nerf_actor_tpu.models.representations import make_embedding


class ContinuousPolicy(nn.Module):
    """MLP action head over embedding features (+ optional proprio)."""

    action_dim: int = 4
    hidden_dim: int = 256

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Dense(self.hidden_dim)(feat))
        h = nn.relu(nn.Dense(self.hidden_dim)(h))
        return jnp.tanh(nn.Dense(self.action_dim)(h))


@dataclasses.dataclass(frozen=True)
class BCConfig:
    embedding: str = "simple"       # representation zoo name
    policy_head: str = "mlp"        # "mlp" | "diffusion"
    task_name: str = "lift"
    obs_mode: str = "image"         # "state" | "image" | "pointcloud"
    action_dim: int = 4
    hidden_dim: int = 256
    lr: float = 3e-4
    batch_size: int = 64
    freeze_encoder: bool = False
    keyframe_mode: bool = False     # keyframe BC + motion interpolation
    image_size: int = 32


class BCTrainer:
    def __init__(self, cfg: BCConfig, obs_example, seed: int = 0):
        self.cfg = cfg
        self.embedding = make_embedding(cfg.embedding)
        key = jax.random.key(seed)
        k1, k2 = jax.random.split(key)
        self.enc_vars = self.embedding.init(k1, _batch_one(obs_example))
        feat = self.embedding(self.enc_vars, _batch_one(obs_example))

        if cfg.policy_head == "diffusion":
            from real_robot_nerf_actor_tpu.rl.diffusion_bc import (
                DiffusionBC, DiffusionBCConfig)
            self.policy = DiffusionBC(DiffusionBCConfig(
                obs_dim=int(feat.shape[-1]), action_dim=cfg.action_dim,
                hidden_dim=cfg.hidden_dim), seed=seed)
            self.pol_params = None
        else:
            self.policy = ContinuousPolicy(cfg.action_dim, cfg.hidden_dim)
            self.pol_params = self.policy.init(k2, feat)["params"]
            self.tx = optax.adam(cfg.lr)
            self.opt_state = self.tx.init(
                self.pol_params if cfg.freeze_encoder
                else (self.pol_params, self.enc_vars))
            self._jit_update = jax.jit(self._mlp_update)
            self._jit_act = jax.jit(self._mlp_act)
        self._rng = np.random.default_rng(seed)

    # ------------------------------------------------------------ mlp head
    def _mlp_act(self, pol_params, enc_vars, obs):
        feat = self.embedding(enc_vars, obs)
        return self.policy.apply({"params": pol_params}, feat)

    def _mlp_update(self, pol_params, enc_vars, opt_state, obs, actions):
        cfg = self.cfg

        if cfg.freeze_encoder:
            feat = jax.lax.stop_gradient(self.embedding(enc_vars, obs))

            def loss_fn(pp):
                pred = self.policy.apply({"params": pp}, feat)
                return jnp.mean((pred - actions) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(pol_params)
            updates, opt_state = self.tx.update(grads, opt_state, pol_params)
            pol_params = optax.apply_updates(pol_params, updates)
            return pol_params, enc_vars, opt_state, loss

        def loss_fn(both):
            pp, ev = both
            feat = self.embedding(ev, obs)
            pred = self.policy.apply({"params": pp}, feat)
            return jnp.mean((pred - actions) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)((pol_params, enc_vars))
        updates, opt_state = self.tx.update(
            grads, opt_state, (pol_params, enc_vars))
        pol_params, enc_vars = optax.apply_updates(
            (pol_params, enc_vars), updates)
        return pol_params, enc_vars, opt_state, loss

    # ----------------------------------------------------------------- API
    def update(self, obs_batch, action_batch) -> float:
        obs_batch = _to_jnp(obs_batch)
        actions = jnp.asarray(action_batch)
        if self.cfg.policy_head == "diffusion":
            feat = np.asarray(self.embedding(self.enc_vars, obs_batch))
            return self.policy.update(feat, np.asarray(actions))
        (self.pol_params, self.enc_vars, self.opt_state, loss) = \
            self._jit_update(self.pol_params, self.enc_vars, self.opt_state,
                             obs_batch, actions)
        return float(loss)

    def act(self, obs) -> np.ndarray:
        obs_b = _batch_one(obs)
        if self.cfg.policy_head == "diffusion":
            feat = np.asarray(self.embedding(self.enc_vars, _to_jnp(obs_b)))
            return self.policy.sample_action(feat[0])
        return np.asarray(self._jit_act(self.pol_params, self.enc_vars,
                                        _to_jnp(obs_b)))[0]

    # ------------------------------------------------------ demo interface
    def dataset_from_trajectories(self, trajs: List[Trajectory]
                                  ) -> Tuple[list, np.ndarray]:
        cfg = self.cfg
        if not cfg.keyframe_mode:
            obs = [o for t in trajs for o in t.observations]
            act = np.stack([a for t in trajs for a in t.actions])
            return obs, act
        # keyframe BC: label each keyframe obs with the interpolated motion
        # toward the NEXT keyframe (simple_motion_planning)
        buf = KeyframeBuffer()
        for t in trajs:
            buf.add_trajectory(t)
        obs, acts = [], []
        kfs = buf.keyframes
        for i in range(len(kfs) - 1):
            path = simple_motion_planning(kfs[i]["ee_pos"],
                                          kfs[i + 1]["ee_pos"], n_steps=1)
            delta = path[0] - kfs[i]["ee_pos"]
            a = np.clip(np.concatenate(
                [delta * 10, [1.0 if kfs[i + 1]["gripper_open"] < 0.5
                              else -1.0]]), -1, 1)
            obs.append(kfs[i]["obs"])
            acts.append(a.astype(np.float32))
        return obs, np.stack(acts)

    def fit(self, trajs: List[Trajectory], epochs: int = 3) -> List[float]:
        obs, actions = self.dataset_from_trajectories(trajs)
        n = len(obs)
        losses = []
        for _ in range(epochs):
            order = self._rng.permutation(n)
            for s in range(0, n, self.cfg.batch_size):
                idx = order[s:s + self.cfg.batch_size]
                ob = _stack_obs([obs[i] for i in idx])
                losses.append(self.update(ob, actions[idx]))
        return losses

    def evaluate(self, env, n_episodes: int = 5, max_steps: int = 40) -> float:
        """Env success rate (the reference's per-epoch evaluation)."""
        succ = 0
        for ep in range(n_episodes):
            obs, _ = env.reset(seed=1000 + ep)
            for _ in range(max_steps):
                obs, r, term, trunc, info = env.step(self.act(obs))
                if info.get("success"):
                    succ += 1
                    break
                if term or trunc:
                    break
        return succ / n_episodes


def _batch_one(obs):
    if isinstance(obs, dict):
        return {k: np.asarray(v)[None] for k, v in obs.items()}
    return np.asarray(obs)[None]


def _stack_obs(obs_list):
    if isinstance(obs_list[0], dict):
        n = min(min(o["points"].shape[0] for o in obs_list), 4096)
        return {k: np.stack([o[k][:n] for o in obs_list])
                for k in obs_list[0]}
    return np.stack(obs_list)


def _to_jnp(obs):
    if isinstance(obs, dict):
        return {k: jnp.asarray(v) for k, v in obs.items()}
    return jnp.asarray(obs)
