"""SAC v2 (pixel / state) in JAX.

Reference behavior: /root/reference/featurenerf_robo/src/algorithms/sacv2.py:11-211:
shared CNN encoder feeding a squashed-Gaussian actor and twin Q critics,
soft target updates, automatic entropy temperature, detached encoder for
the actor loss. Rebuilt as pure jitted update functions over flax modules.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SACConfig:
    action_dim: int = 4
    obs_type: str = "state"        # "state" | "image"
    hidden_dim: int = 256
    encoder_feature_dim: int = 50
    discount: float = 0.99
    tau: float = 0.01              # soft target update rate
    init_temperature: float = 0.1
    actor_lr: float = 1e-3
    critic_lr: float = 1e-3
    alpha_lr: float = 1e-4
    actor_update_freq: int = 2
    target_update_freq: int = 2
    log_std_min: float = -10.0
    log_std_max: float = 2.0


class PixelEncoder(nn.Module):
    """4-conv pixel encoder + layernorm-tanh projection (SAC-AE style)."""

    feature_dim: int = 50

    @nn.compact
    def __call__(self, x):
        for i, s in enumerate([2, 1, 1, 1]):
            x = nn.relu(nn.Conv(32, (3, 3), strides=(s, s))(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.feature_dim)(x)
        return jnp.tanh(nn.LayerNorm()(x))


class Actor(nn.Module):
    cfg: SACConfig

    @nn.compact
    def __call__(self, feat):
        h = nn.relu(nn.Dense(self.cfg.hidden_dim)(feat))
        h = nn.relu(nn.Dense(self.cfg.hidden_dim)(h))
        out = nn.Dense(self.cfg.action_dim * 2)(h)
        mu, log_std = jnp.split(out, 2, axis=-1)
        lo, hi = self.cfg.log_std_min, self.cfg.log_std_max
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std) + 1.0)
        return mu, log_std


class Critic(nn.Module):
    cfg: SACConfig

    @nn.compact
    def __call__(self, feat, action):
        x = jnp.concatenate([feat, action], axis=-1)

        def q(x, name):
            h = nn.relu(nn.Dense(self.cfg.hidden_dim, name=f"{name}_fc1")(x))
            h = nn.relu(nn.Dense(self.cfg.hidden_dim, name=f"{name}_fc2")(h))
            return nn.Dense(1, name=f"{name}_out")(h)[..., 0]

        return q(x, "q1"), q(x, "q2")


class _Nets(nn.Module):
    cfg: SACConfig

    def setup(self):
        self.encoder = (PixelEncoder(self.cfg.encoder_feature_dim)
                        if self.cfg.obs_type == "image" else
                        (lambda x: x))
        self.actor = Actor(self.cfg)
        self.critic = Critic(self.cfg)

    def encode(self, obs):
        return self.encoder(obs) if self.cfg.obs_type == "image" else obs

    def pi(self, obs):
        return self.actor(self.encode(obs))

    def q(self, obs, action):
        return self.critic(self.encode(obs), action)

    def __call__(self, obs, action):
        return self.pi(obs), self.q(obs, action)


def _squash(key, mu, log_std):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + eps * std
    a = jnp.tanh(pre)
    logp = (-0.5 * (eps ** 2) - log_std
            - 0.5 * jnp.log(2 * jnp.pi)).sum(-1)
    logp -= jnp.log(jax.nn.relu(1.0 - a ** 2) + 1e-6).sum(-1)
    return a, logp


class SACAgent:
    def __init__(self, cfg: SACConfig, obs_example: np.ndarray, seed: int = 0):
        self.cfg = cfg
        self.net = _Nets(cfg)
        key = jax.random.key(seed)
        obs = jnp.asarray(obs_example)[None]
        act = jnp.zeros((1, cfg.action_dim))
        self.params = self.net.init(key, obs, act)["params"]
        self.target_params = jax.tree_util.tree_map(lambda x: x, self.params)
        self.log_alpha = jnp.log(jnp.asarray(cfg.init_temperature))
        self.target_entropy = -float(cfg.action_dim)

        self.actor_tx = optax.adam(cfg.actor_lr)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.alpha_tx = optax.adam(cfg.alpha_lr)
        self.actor_opt = self.actor_tx.init(self.params)
        self.critic_opt = self.critic_tx.init(self.params)
        self.alpha_opt = self.alpha_tx.init(self.log_alpha)
        self._step = 0
        self._rng = jax.random.key(seed + 1)

        self._jit_act = jax.jit(self._act_fn)
        self._jit_critic = jax.jit(self._critic_update)
        self._jit_actor = jax.jit(self._actor_update)
        self._jit_alpha = jax.jit(self._alpha_update)
        self._jit_soft = jax.jit(self._soft_update)

    # ------------------------------------------------------------- acting
    def _act_fn(self, params, obs, key, deterministic: bool):
        mu, log_std = self.net.apply({"params": params}, obs,
                                     method=self.net.pi)
        a, _ = _squash(key, mu, log_std)
        return jnp.where(deterministic, jnp.tanh(mu), a)

    def select_action(self, obs) -> np.ndarray:
        self._rng, k = jax.random.split(self._rng)
        return np.asarray(self._jit_act(self.params, jnp.asarray(obs)[None],
                                        k, True))[0]

    def sample_action(self, obs) -> np.ndarray:
        self._rng, k = jax.random.split(self._rng)
        return np.asarray(self._jit_act(self.params, jnp.asarray(obs)[None],
                                        k, False))[0]

    # ------------------------------------------------------------- updates
    def _critic_update(self, params, target_params, critic_opt, log_alpha,
                       batch, key):
        cfg = self.cfg

        mu, log_std = self.net.apply({"params": params}, batch["next_obs"],
                                     method=self.net.pi)
        next_a, next_logp = _squash(key, mu, log_std)
        tq1, tq2 = self.net.apply({"params": target_params},
                                  batch["next_obs"], next_a,
                                  method=self.net.q)
        target_v = jnp.minimum(tq1, tq2) - jnp.exp(log_alpha) * next_logp
        target_q = batch["reward"] + (1.0 - batch["done"]) * cfg.discount * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def loss_fn(p):
            q1, q2 = self.net.apply({"params": p}, batch["obs"],
                                    batch["action"], method=self.net.q)
            td1 = q1 - target_q
            td2 = q2 - target_q
            loss = (batch["weights"] * (td1 ** 2 + td2 ** 2)).mean()
            return loss, jnp.abs(td1) + jnp.abs(td2)

        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, critic_opt = self.critic_tx.update(grads, critic_opt, params)
        params = optax.apply_updates(params, updates)
        return params, critic_opt, loss, td

    def _actor_update(self, params, actor_opt, log_alpha, batch, key):
        def loss_fn(p):
            # detached encoder: actor gradients must not reshape the encoder
            feat = self.net.apply({"params": params}, batch["obs"],
                                  method=self.net.encode)
            feat = jax.lax.stop_gradient(feat)
            mu, log_std = self.net.apply(
                {"params": p}, feat,
                method=lambda m, f: m.actor(f))
            a, logp = _squash(key, mu, log_std)
            q1, q2 = self.net.apply({"params": params}, batch["obs"], a,
                                    method=self.net.q)
            q = jnp.minimum(q1, q2)
            return (jnp.exp(log_alpha) * logp - q).mean(), logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, actor_opt = self.actor_tx.update(grads, actor_opt, params)
        params = optax.apply_updates(params, updates)
        return params, actor_opt, loss, logp.mean()

    def _alpha_update(self, log_alpha, alpha_opt, mean_logp):
        def loss_fn(la):
            return -(jnp.exp(la) * (mean_logp + self.target_entropy))

        loss, grad = jax.value_and_grad(loss_fn)(log_alpha)
        updates, alpha_opt = self.alpha_tx.update(grad, alpha_opt, log_alpha)
        return optax.apply_updates(log_alpha, updates), alpha_opt, loss

    def _soft_update(self, params, target_params):
        tau = self.cfg.tau
        return jax.tree_util.tree_map(
            lambda t, p: (1 - tau) * t + tau * p, target_params, params)

    def update(self, batch) -> dict:
        batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "idx"}
        self._rng, k1, k2 = jax.random.split(self._rng, 3)
        self.params, self.critic_opt, critic_loss, td = self._jit_critic(
            self.params, self.target_params, self.critic_opt,
            self.log_alpha, batch, k1)
        metrics = {"critic_loss": float(critic_loss)}
        if self._step % self.cfg.actor_update_freq == 0:
            self.params, self.actor_opt, actor_loss, mean_logp = \
                self._jit_actor(self.params, self.actor_opt, self.log_alpha,
                                batch, k2)
            self.log_alpha, self.alpha_opt, alpha_loss = self._jit_alpha(
                self.log_alpha, self.alpha_opt, mean_logp)
            metrics.update(actor_loss=float(actor_loss),
                           alpha=float(jnp.exp(self.log_alpha)))
        if self._step % self.cfg.target_update_freq == 0:
            self.target_params = self._jit_soft(self.params, self.target_params)
        self._step += 1
        metrics["td_abs"] = np.asarray(td)
        return metrics
