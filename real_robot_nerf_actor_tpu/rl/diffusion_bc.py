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
