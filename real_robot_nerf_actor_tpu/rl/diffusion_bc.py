"""Diffusion-policy behavior cloning (DDPM) in JAX.

Reference behavior: /root/reference/featurenerf_robo/src/diffusion_bc/
(diffusion.py:16-178 Diffusion forward/reverse with linear/vp beta
schedules, bc_diffusion.py:11-70 Diffusion_BC agent with an MLP noise
model conditioned on state and timestep).

TPU design: the reverse-diffusion sampler is a lax.scan over timesteps
(one compiled graph, no per-step dispatch); training is a single jitted
epsilon-prediction MSE step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class DiffusionBCConfig:
    obs_dim: int = 7
    action_dim: int = 4
    hidden_dim: int = 256
    n_timesteps: int = 100
    beta_schedule: str = "vp"   # "linear" | "vp"
    lr: float = 3e-4


def make_betas(schedule: str, t: int) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(1e-4, 2e-2, t)
    if schedule == "vp":
        ts = np.arange(1, t + 1)
        return 1.0 - np.exp(-1e-4 - 5e-3 * (2 * ts - 1) / (t ** 2) * 10)
    raise ValueError(schedule)


class NoiseMLP(nn.Module):
    cfg: DiffusionBCConfig

    @nn.compact
    def __call__(self, action, t, obs):
        # sinusoidal timestep embedding
        half = 16
        freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
        temb = t[:, None].astype(jnp.float32) * freqs[None]
        temb = jnp.concatenate([jnp.sin(temb), jnp.cos(temb)], axis=-1)
        temb = nn.relu(nn.Dense(32)(temb))

        x = jnp.concatenate([action, temb, obs], axis=-1)
        for _ in range(3):
            x = nn.relu(nn.Dense(self.cfg.hidden_dim)(x))
        return nn.Dense(self.cfg.action_dim)(x)


class DiffusionBC:
    def __init__(self, cfg: DiffusionBCConfig, seed: int = 0):
        self.cfg = cfg
        self.net = NoiseMLP(cfg)
        key = jax.random.key(seed)
        self.params = self.net.init(
            key, jnp.zeros((1, cfg.action_dim)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, cfg.obs_dim)))["params"]
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.key(seed + 1)

        betas = jnp.asarray(make_betas(cfg.beta_schedule, cfg.n_timesteps),
                            jnp.float32)
        alphas = 1.0 - betas
        self.alpha_bar = jnp.cumprod(alphas)
        self.betas = betas
        self.alphas = alphas

        self._jit_update = jax.jit(self._update)
        self._jit_sample = jax.jit(self._sample)

    # -------------------------------------------------------------- train
    def _update(self, params, opt_state, obs, actions, key):
        b = actions.shape[0]
        k_t, k_eps = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.cfg.n_timesteps)
        eps = jax.random.normal(k_eps, actions.shape)
        ab = self.alpha_bar[t][:, None]
        noisy = jnp.sqrt(ab) * actions + jnp.sqrt(1.0 - ab) * eps

        def loss_fn(p):
            pred = self.net.apply({"params": p}, noisy, t, obs)
            return jnp.mean((pred - eps) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def update(self, obs: np.ndarray, actions: np.ndarray) -> float:
        self._rng, k = jax.random.split(self._rng)
        self.params, self.opt_state, loss = self._jit_update(
            self.params, self.opt_state, jnp.asarray(obs),
            jnp.asarray(actions), k)
        return float(loss)

    # ------------------------------------------------------------- sample
    def _sample(self, params, obs, key):
        b = obs.shape[0]
        cfg = self.cfg
        k_init, k_scan = jax.random.split(key)
        x = jax.random.normal(k_init, (b, cfg.action_dim))

        def step(carry, t):
            x, key = carry
            key, k_noise = jax.random.split(key)
            tb = jnp.full((b,), t, jnp.int32)
            eps = self.net.apply({"params": params}, x, tb, obs)
            alpha = self.alphas[t]
            ab = self.alpha_bar[t]
            mean = (x - (1 - alpha) / jnp.sqrt(1 - ab) * eps) / jnp.sqrt(alpha)
            noise = jax.random.normal(k_noise, x.shape) * jnp.sqrt(self.betas[t])
            x = jnp.where(t > 0, mean + noise, mean)
            return (x, key), None

        (x, _), _ = jax.lax.scan(
            step, (x, k_scan), jnp.arange(cfg.n_timesteps - 1, -1, -1))
        return jnp.clip(x, -1.0, 1.0)

    def sample_action(self, obs: np.ndarray) -> np.ndarray:
        self._rng, k = jax.random.split(self._rng)
        single = obs.ndim == 1
        ob = jnp.asarray(obs)[None] if single else jnp.asarray(obs)
        a = self._jit_sample(self.params, ob, k)
        return np.asarray(a[0] if single else a)


# ---------------------------------------------------------------------------
# Diffusion Q-learning variant
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiffusionQLConfig:
    """Reference: featurenerf_robo/src/diffusion_bc/ql_diffusion.py
    (Diffusion_QL): DDPM actor trained with BC + eta * Q loss, twin critic
    with soft target updates, EMA actor for target actions."""
    obs_dim: int = 7
    action_dim: int = 4
    hidden_dim: int = 256
    n_timesteps: int = 100
    beta_schedule: str = "vp"
    lr: float = 3e-4
    critic_lr: float = 3e-4
    eta: float = 1.0
    discount: float = 0.99
    tau: float = 0.005
    ema_decay: float = 0.995
    update_ema_every: int = 5


class TwinCritic(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)

        def q(name):
            h = x
            for i in range(2):
                h = nn.relu(nn.Dense(self.hidden, name=f"{name}_h{i}")(h))
            return nn.Dense(1, name=f"{name}_out")(h)[..., 0]

        return q("q1"), q("q2")


class DiffusionQL(DiffusionBC):
    """One jitted update: critic TD step (targets from the EMA actor's full
    reverse-diffusion sample), then actor step whose gradient flows through
    the whole sampler scan (the reference backprops through all timesteps
    too), plus soft target / periodic EMA updates — all in-graph."""

    def __init__(self, cfg: DiffusionQLConfig, seed: int = 0):
        base = DiffusionBCConfig(
            obs_dim=cfg.obs_dim, action_dim=cfg.action_dim,
            hidden_dim=cfg.hidden_dim, n_timesteps=cfg.n_timesteps,
            beta_schedule=cfg.beta_schedule, lr=cfg.lr)
        super().__init__(base, seed)
        self.ql = cfg
        self.critic = TwinCritic(cfg.hidden_dim)
        key = jax.random.key(seed + 2)
        self.critic_params = self.critic.init(
            key, jnp.zeros((1, cfg.obs_dim)),
            jnp.zeros((1, cfg.action_dim)))["params"]
        self.critic_target = jax.tree_util.tree_map(
            jnp.copy, self.critic_params)
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.critic_tx = optax.adam(cfg.critic_lr)
        self.critic_opt_state = self.critic_tx.init(self.critic_params)
        self.step = 0
        self._jit_update_ql = jax.jit(self._update_ql,
                                      static_argnames=("do_ema",))

    def _update_ql(self, params, ema_params, critic_params, critic_target,
                   opt_state, critic_opt_state, batch, key, do_ema):
        cfg = self.ql
        obs, actions, next_obs, reward, not_done = batch
        k_t, k_eps, k_next, k_new, k_coin = jax.random.split(key, 5)

        # ---- critic TD step (EMA actor supplies target actions)
        next_a = jax.lax.stop_gradient(self._sample(ema_params, next_obs,
                                                    k_next))
        tq1, tq2 = self.critic.apply({"params": critic_target}, next_obs,
                                     next_a)
        target_q = jax.lax.stop_gradient(
            reward + not_done * cfg.discount * jnp.minimum(tq1, tq2))

        def critic_loss_fn(cp):
            q1, q2 = self.critic.apply({"params": cp}, obs, actions)
            return jnp.mean((q1 - target_q) ** 2) + jnp.mean(
                (q2 - target_q) ** 2)

        critic_loss, cgrads = jax.value_and_grad(critic_loss_fn)(critic_params)
        cupd, critic_opt_state = self.critic_tx.update(
            cgrads, critic_opt_state, critic_params)
        critic_params = optax.apply_updates(critic_params, cupd)

        # ---- actor step: DDPM BC loss + eta * normalized Q loss
        b = actions.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.cfg.n_timesteps)
        eps = jax.random.normal(k_eps, actions.shape)
        ab = self.alpha_bar[t][:, None]
        noisy = jnp.sqrt(ab) * actions + jnp.sqrt(1.0 - ab) * eps

        def actor_loss_fn(p):
            pred = self.net.apply({"params": p}, noisy, t, obs)
            bc = jnp.mean((pred - eps) ** 2)
            new_a = self._sample(p, obs, k_new)
            q1n, q2n = self.critic.apply({"params": critic_params}, obs,
                                         new_a)
            coin = jax.random.bernoulli(k_coin)
            q_loss = jnp.where(
                coin,
                -jnp.mean(q1n) / jax.lax.stop_gradient(
                    jnp.mean(jnp.abs(q2n)) + 1e-8),
                -jnp.mean(q2n) / jax.lax.stop_gradient(
                    jnp.mean(jnp.abs(q1n)) + 1e-8))
            return bc + cfg.eta * q_loss, (bc, q_loss)

        (actor_loss, (bc_loss, q_loss)), agrads = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(params)
        aupd, opt_state = self.tx.update(agrads, opt_state, params)
        params = optax.apply_updates(params, aupd)

        # ---- targets
        critic_target = jax.tree_util.tree_map(
            lambda p, tp: cfg.tau * p + (1 - cfg.tau) * tp,
            critic_params, critic_target)
        if do_ema:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: cfg.ema_decay * e + (1 - cfg.ema_decay) * p,
                ema_params, params)
        metrics = {"bc_loss": bc_loss, "ql_loss": q_loss,
                   "actor_loss": actor_loss, "critic_loss": critic_loss}
        return (params, ema_params, critic_params, critic_target, opt_state,
                critic_opt_state, metrics)

    def update_ql(self, obs, actions, next_obs, reward, not_done):
        self._rng, k = jax.random.split(self._rng)
        batch = tuple(jnp.asarray(a, jnp.float32)
                      for a in (obs, actions, next_obs, reward, not_done))
        do_ema = (self.step % self.ql.update_ema_every) == 0
        (self.params, self.ema_params, self.critic_params,
         self.critic_target, self.opt_state, self.critic_opt_state,
         metrics) = self._jit_update_ql(
            self.params, self.ema_params, self.critic_params,
            self.critic_target, self.opt_state, self.critic_opt_state,
            batch, k, do_ema=do_ema)
        self.step += 1
        return {k_: float(v) for k_, v in metrics.items()}
