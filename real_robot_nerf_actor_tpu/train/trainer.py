"""Unified trainer runtime: optimizer, checkpoint/resume, logging, step loop.

Replaces the reference's per-script loops and its two checkpoint styles
(flat state_dict dumps train_peract_single_kitchen_single_task.py:728-731 and
managed latest+backup trainlib resume featurenerf/train/trainlib/trainer.py:56-103)
with one Orbax-backed manager storing params/opt_state/step together, keeping
the latest+backup semantics via Orbax's max_to_keep.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from real_robot_nerf_actor_tpu.utils.logger import Logger


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-6
    grad_clip: float = 0.0
    # 'adamw' matches the reference Adam(lr=1e-4, weight_decay=1e-6)
    name: str = "adamw"
    lr_decay_rate: float = 0.0   # exponential decay per step (0 = constant)
    accum_steps: int = 1         # gradient accumulation (trainlib parity)
    # cosine decay with linear warmup (the reference's long BC runs use a
    # constant LR and effectively memorize; decay stabilizes the late BC
    # decode — round-3 flagship regressed 75%->65% between 9k and 15k
    # steps at constant LR). schedule='cosine' requires decay_steps.
    schedule: str = "constant"   # 'constant' | 'cosine'
    warmup_steps: int = 0
    decay_steps: int = 0         # cosine horizon (usually num_steps)
    min_lr_frac: float = 0.05    # final LR = min_lr_frac * lr
    # drop (don't apply) any update whose gradients contain NaN/Inf, up to
    # this many consecutive times; 0 disables. Global-norm clipping does
    # NOT protect against a nonfinite gradient (an inf global norm scales
    # the whole update to inf*0 = NaN): both round-5 multitask fine-tunes
    # NaN'd the params this way at bs=1/accum=1 despite grad_clip=1.0
    # (BENCH_NOTES round 5). Wrapped OUTERMOST so a bad microbatch never
    # reaches the MultiSteps accumulator or the Adam moments.
    skip_nonfinite: int = 100


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    num_steps: int = 100000
    log_every: int = 50
    ckpt_every: int = 10000
    eval_every: int = 2000
    seed: int = 0
    ckpt_dir: Optional[str] = None
    log_dir: Optional[str] = None
    max_ckpts_to_keep: int = 2   # latest + backup
    # background-thread batches-in-flight: host-side generation + the
    # host->device upload overlap the previous step's device compute
    # (jax dispatch is async; the reference's DataLoader(num_workers=8)
    # plays the same role). 0 disables.
    prefetch: int = 2
    # best-checkpoint selection: when best_key names a metric returned by
    # eval_fn, the state at the best value (per best_mode) is kept in
    # <ckpt_dir>_best alongside the rolling latest+backup. The round-3
    # flagship's best BC checkpoint (75% decode at 9k steps) was silently
    # discarded by keep-latest retention.
    best_key: Optional[str] = None
    best_mode: str = "max"       # 'max' | 'min'
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)


def prefetch_iterator(it: Iterator, depth: int = 2) -> Iterator:
    """Run `it` in a daemon thread, keeping `depth` items ready."""
    if depth <= 0:
        return it
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    # data-pipeline exceptions must reach the training loop: a crashing
    # iterator must not look like normal exhaustion (ADVICE r2)
    err: list = []

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised in gen()
            err.append(e)
        finally:
            q.put(stop)

    threading.Thread(target=worker, daemon=True).start()

    def gen():
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                return
            yield item

    return gen()


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    extra: Any = None    # e.g. batch_stats for BN models


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.schedule == "cosine":
        assert cfg.decay_steps > 0, "schedule='cosine' needs decay_steps"
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps > 0 else cfg.lr,
            peak_value=cfg.lr, warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=cfg.decay_steps,
            end_value=cfg.min_lr_frac * cfg.lr)
    elif cfg.lr_decay_rate > 0:
        schedule = optax.exponential_decay(cfg.lr, 1, 1.0 - cfg.lr_decay_rate)
    else:
        schedule = cfg.lr
    if cfg.name == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.name == "adam":
        tx = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    if cfg.skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, cfg.skip_nonfinite)
    return tx


class CheckpointManager:
    """Orbax wrapper with latest+backup retention and full-state restore."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        import orbax.checkpoint as ocp
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: TrainState):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_raw_params(self, step: Optional[int] = None):
        """The checkpoint's params tree in its OWN structure (no caller
        template): for cross-config warm starts, e.g. grafting a trained
        policy subtree into a run whose nerf field changed shape."""
        import jax
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        local = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore(
            None, fallback_sharding=local))
        if isinstance(raw, dict) and "params" not in raw and raw:
            raw = next(iter(raw.values()))
        return raw["params"]

    def restore(self, state_like: TrainState, step: Optional[int] = None,
                params_only: bool = False) -> Optional[TrainState]:
        """Full-state restore; with params_only=True only params/extra/step
        are read and the optimizer state is kept from `state_like` —
        evaluation/serving of a checkpoint must not depend on the optimizer
        tree (a schedule change alters opt_state's structure and would
        otherwise make every older checkpoint unrestorable for eval)."""
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if not params_only:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_like))
        import jax
        # build the restore target's opt_state from the CHECKPOINT's own
        # structure metadata (whatever optimizer it was trained with),
        # then throw that subtree away
        # restores must work across devices too (a TPU-trained checkpoint
        # evaluated on CPU): never trust the saved shardings
        local = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        meta = self._mgr.item_metadata(step)
        meta_tree = getattr(meta, "tree", meta)
        if meta_tree is not None:
            skeleton = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=local),
                meta_tree["opt_state"],
                is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"))
            partial = self._mgr.restore(step, args=ocp.args.StandardRestore(
                state_like.replace(opt_state=skeleton),
                fallback_sharding=local))
            return partial.replace(opt_state=state_like.opt_state)
        # older checkpoints carry no structure metadata: raw restore (the
        # saved tree comes back as plain dicts), pick the non-optimizer
        # fields out of it
        raw = self._mgr.restore(step, args=ocp.args.StandardRestore(
            None, fallback_sharding=local))
        if isinstance(raw, dict) and "params" not in raw and raw:
            raw = next(iter(raw.values()))       # composite {'default': ...}
        return state_like.replace(
            step=jnp.asarray(raw["step"]), params=raw["params"],
            extra=raw.get("extra", state_like.extra))


class Trainer:
    """Generic step-driven trainer.

    Subclasses (or callers) provide:
      - init_state(rng) -> TrainState
      - train_step(state, batch, rng) -> (state, metrics)  [jitted here]
      - data: an iterator of batches (host-side; see data/)
      - optional eval_fn(state, step) -> metrics dict
    """

    def __init__(self, cfg: TrainConfig,
                 train_step: Callable,
                 data: Iterator,
                 init_state: Callable[[jax.Array], TrainState],
                 eval_fn: Optional[Callable] = None,
                 donate_state: bool = True):
        self.cfg = cfg
        self.data = prefetch_iterator(data, cfg.prefetch)
        self.eval_fn = eval_fn
        self._init_state = init_state
        self._step_fn = jax.jit(
            train_step, donate_argnums=(0,) if donate_state else ())
        self.logger = Logger(cfg.log_dir, print_every=cfg.log_every)
        self.ckpt = (CheckpointManager(cfg.ckpt_dir, cfg.max_ckpts_to_keep)
                     if cfg.ckpt_dir else None)
        self.best_ckpt = (
            CheckpointManager(cfg.ckpt_dir + "_best", max_to_keep=1)
            if cfg.ckpt_dir and cfg.best_key else None)

    # ------------------------------------------------------ best tracking
    def _best_path(self) -> str:
        return os.path.join(self.cfg.ckpt_dir + "_best", "best.json")

    def _load_best(self) -> Optional[float]:
        try:
            import json
            with open(self._best_path()) as f:
                return float(json.load(f)["value"])
        except (OSError, ValueError, KeyError):
            return None

    def _maybe_save_best(self, state: TrainState, step: int,
                         metrics: Dict[str, Any]):
        if self.best_ckpt is None or self.cfg.best_key not in metrics:
            return
        val = float(metrics[self.cfg.best_key])
        prev = self._load_best()
        better = (prev is None
                  or (val > prev if self.cfg.best_mode == "max"
                      else val < prev))
        if better:
            import json
            self.best_ckpt.save(step, state)
            with open(self._best_path(), "w") as f:
                json.dump({"key": self.cfg.best_key, "value": val,
                           "step": step}, f)
            print(f"[trainer] new best {self.cfg.best_key}={val:.4f} "
                  f"at step {step}")

    def run(self, resume: bool = True) -> TrainState:
        rng = jax.random.key(self.cfg.seed)
        rng, init_rng = jax.random.split(rng)
        state = self._init_state(init_rng)
        start = 0
        if resume and self.ckpt is not None:
            try:
                restored = self.ckpt.restore(state)
            except ValueError as e:
                # optimizer changed since the checkpoint was written (e.g.
                # a fine-tune adds MultiSteps accumulation): carry the
                # params/extra/step over and warm the optimizer fresh
                print("[trainer] full-state resume failed "
                      f"({type(e).__name__}); retrying params-only")
                restored = self.ckpt.restore(state, params_only=True)
            if restored is not None:
                state = restored
                start = int(state.step)
                print(f"[trainer] resumed from step {start}")

        t_last = time.time()
        for step in range(start, self.cfg.num_steps):
            batch = next(self.data)
            rng, step_rng = jax.random.split(rng)
            state, metrics = self._step_fn(state, batch, step_rng)
            if (step + 1) % self.cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                # surface the nonfinite-update guard's skip counter (optax
                # ApplyIfFiniteState sits outermost when skip_nonfinite>0)
                tn = getattr(state.opt_state, "total_notfinite", None)
                if tn is not None:
                    metrics["grad_skips"] = float(tn)
                metrics["steps_per_sec"] = self.cfg.log_every / (
                    time.time() - t_last)
                t_last = time.time()
                self.logger.log(metrics, step + 1)
            if self.eval_fn is not None and (step + 1) % self.cfg.eval_every == 0:
                ev = self.eval_fn(state, step + 1)
                if ev:
                    self.logger.log(ev, step + 1, category="eval")
                    self._maybe_save_best(state, step + 1, ev)
            if self.ckpt is not None and (step + 1) % self.cfg.ckpt_every == 0:
                self.ckpt.save(step + 1, state)
        if self.ckpt is not None and int(state.step) % self.cfg.ckpt_every != 0:
            self.ckpt.save(int(state.step), state)
        return state
