"""PerAct BC training: voxelize -> PerceiverIO -> cross-entropy losses.

Reference behavior: the training iteration of
/root/reference/train_peract_single_kitchen_single_task.py:848-958
(single/multi task and multi kitchen are *data* configs here, not separate
script copies — cf. SURVEY.md §7.5).

TPU design: the whole step — SE(3) aug, scatter voxelization, the 100^3
PerceiverIO forward, CE losses, and the AdamW update — is ONE jitted
function. Batches are host-assembled numpy with static shapes
(points padded to max_num_coords).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real_robot_nerf_actor_tpu.data.replay import (
    PointCloudSample, pad_point_cloud)
from real_robot_nerf_actor_tpu.data.synthetic import (
    make_synthetic_demo, make_synthetic_scene)
from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
from real_robot_nerf_actor_tpu.ops import (
    VoxelizerSpec, apply_se3_augmentation, discretize_action, voxelize)
from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
from real_robot_nerf_actor_tpu.train.trainer import (
    OptimConfig, TrainConfig, TrainState, Trainer, make_optimizer)


def iter_transitions(rng: np.random.Generator, train_demos,
                     num_transitions, sample_mode: str = "uniform"
                     ) -> Iterator[Tuple[int, int]]:
    """Yield (demo, keyframe) pairs forever.

    "uniform": i.i.d. draws (the reference's sampling loop,
    train_nerfact_multi_kitchen.py:1256-1284). "demo_cycle": emit one
    random demo's FULL transition set (shuffled) before drawing the next
    demo — with gradient accumulation equal to transitions-per-demo every
    optimizer step then averages a whole demo, so keyframe pairs whose
    inputs differ only in the gripper bit (grasp/retreat) contribute
    their opposing CE gradients to the SAME update instead of
    alternating and cancelling across bs=1 steps (BENCH_NOTES round 4).

    num_transitions: demo id -> number of transitions (keyframes - 1).
    """
    if sample_mode not in ("uniform", "demo_cycle"):
        raise ValueError(f"unknown sample_mode {sample_mode!r}")
    cycle: list = []
    while True:
        if sample_mode == "demo_cycle":
            if not cycle:
                d = train_demos[int(rng.integers(0, len(train_demos)))]
                ks = rng.permutation(num_transitions(d))
                cycle = [(d, int(k)) for k in ks]
            yield cycle.pop()
        else:
            d = train_demos[int(rng.integers(0, len(train_demos)))]
            yield d, int(rng.integers(0, num_transitions(d)))


@dataclasses.dataclass(frozen=True)
class PerActConfig:
    model: PerceiverConfig = dataclasses.field(default_factory=PerceiverConfig)
    voxelizer: VoxelizerSpec = dataclasses.field(default_factory=VoxelizerSpec)
    coord_bounds: Tuple[float, ...] = (-0.1, -0.3, -0.2, 0.8, 0.7, 0.7)
    rotation_resolution: float = 5.0
    trans_aug_range: Tuple[float, float, float] = (0.125, 0.05, 0.05)
    use_se3_aug: bool = True
    # weight of the auxiliary coarse-trans CE (used iff model.aux_trans_head)
    lambda_aux_trans: float = 0.5
    # epsilon of spatial label smoothing on the trans target (0 = reference
    # one-hot CE; see bc_losses)
    trans_label_smooth: float = 0.0
    # PaLM-style z-loss (log^2 Z) on the CE heads; bounds the logit scale
    # whose unbounded growth overflowed the bs=1 fine-tune backward
    # (round-5 forensics, see bc_losses docstring). 0 = off (reference CE).
    z_loss: float = 0.0
    # SE(3)-aug clamp semantics (ops/se3_aug.py): True = symmetric clamp
    # window (zero-mean shift marginal for every keyframe; round-4 fix for
    # the boundary-keyframe decode bias), False = the reference's truncated
    # one-sided support (agent_function.py:111-234). A semantic deviation
    # from the reference, so it is a visible config knob (CLAUDE.md rule).
    se3_symmetric_clamp: bool = True
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def bc_losses(q_trans: jnp.ndarray, q_rot_grip: jnp.ndarray,
              q_collision: jnp.ndarray, action: DiscreteAction,
              voxel_size: int, num_rotation_classes: int = 72,
              q_trans_aux: Optional[jnp.ndarray] = None,
              patch_size: int = 5, lambda_aux: float = 0.5,
              trans_smooth: float = 0.0, z_loss: float = 0.0
              ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Cross-entropy on all heads against discrete expert actions.

    Matches the reference losses (train_peract_...py:931-953) without
    materializing one-hots: integer-label CE on trans (V^3-way), rot x/y/z
    (R-way), grip (2-way), collision (2-way).

    Two opt-in deviations (both documented config knobs, off by default):
    q_trans_aux adds lambda_aux * CE of a COARSE (V/patch)^3 head against
    the down-binned target (dense trunk gradient for free-space targets —
    the round-4 k3-retreat fix); trans_smooth > 0 spreads epsilon of the
    trans target over a separable [0.25, 0.5, 0.25]^3 neighborhood
    (spatial label smoothing; GT that sits between demos stops whipsawing
    single voxels).

    z_loss > 0 adds z_loss * mean(log^2 Z) over the trans + rot/grip
    softmaxes (PaLM-style logit regularization). Round-5 forensics
    (scripts/grad_forensics.py, BENCH_NOTES): at bs=1/accum=1 the trans
    logits grew unbounded (max 3.4e4), and the backward's measured gain
    through the decoder chain (x6.6e9 at unit cotangents; up0 alone
    x2.4e3) then overflowed fp32 -> inf gradients, which global-norm
    clipping turns into NaN params. Bounding log Z keeps the logit scale
    (and with it the cotangent magnitudes) in range; the recommended
    stabilizer for bs=1 fine-tune recipes. Off by default (the committed
    flagship evidence trains without it).
    """
    b = q_trans.shape[0]
    r = num_rotation_classes
    flat_idx = (action.trans[:, 0] * voxel_size * voxel_size
                + action.trans[:, 1] * voxel_size + action.trans[:, 2])
    ce = optax.softmax_cross_entropy_with_integer_labels
    if trans_smooth > 0.0:
        logp = jax.nn.log_softmax(q_trans.reshape(b, -1), axis=-1)
        center = -logp[jnp.arange(b), flat_idx]
        w1 = jnp.asarray([0.25, 0.5, 0.25])
        nb = jnp.zeros((b,))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    w = float(w1[dx + 1] * w1[dy + 1] * w1[dz + 1])
                    t = jnp.clip(
                        action.trans + jnp.asarray([dx, dy, dz]), 0,
                        voxel_size - 1)
                    fi = (t[:, 0] * voxel_size * voxel_size
                          + t[:, 1] * voxel_size + t[:, 2])
                    nb = nb - w * logp[jnp.arange(b), fi]
        trans_loss = (1.0 - trans_smooth) * center + trans_smooth * nb
    else:
        trans_loss = ce(q_trans.reshape(b, -1), flat_idx)
    rot_grip_loss = (
        ce(q_rot_grip[:, 0 * r:1 * r], action.rot_grip[:, 0])
        + ce(q_rot_grip[:, 1 * r:2 * r], action.rot_grip[:, 1])
        + ce(q_rot_grip[:, 2 * r:3 * r], action.rot_grip[:, 2])
        + ce(q_rot_grip[:, 3 * r:], action.rot_grip[:, 3]))
    collision_loss = ce(q_collision, action.collision[:, 0])
    total = jnp.mean(trans_loss + rot_grip_loss + collision_loss)
    metrics = {
        "loss_trans": jnp.mean(trans_loss),
        "loss_rot_grip": jnp.mean(rot_grip_loss),
        "loss_collision": jnp.mean(collision_loss),
    }
    if z_loss > 0.0:
        lse = jax.nn.logsumexp
        z = (jnp.mean(lse(q_trans.reshape(b, -1), axis=-1) ** 2)
             + jnp.mean(sum(
                 lse(q_rot_grip[:, i * r:(i + 1) * r], axis=-1) ** 2
                 for i in range(3))
                 + lse(q_rot_grip[:, 3 * r:], axis=-1) ** 2))
        total = total + z_loss * z
        metrics["loss_z"] = z_loss * z
    if q_trans_aux is not None:
        s = voxel_size // patch_size
        ct = action.trans // patch_size
        aux_idx = ct[:, 0] * s * s + ct[:, 1] * s + ct[:, 2]
        aux_loss = jnp.mean(ce(q_trans_aux, aux_idx))
        total = total + lambda_aux * aux_loss
        metrics["loss_trans_aux"] = aux_loss
    metrics["loss"] = total
    return total, metrics


class PerActTrainer:
    """Builds the jitted train step + host data pipeline for PerAct BC."""

    def __init__(self, cfg: PerActConfig):
        self.cfg = cfg
        self.net = PerceiverIO(cfg.model)
        self.tx = make_optimizer(cfg.train.optim)
        self.bounds = jnp.asarray(cfg.coord_bounds)

    # ------------------------------------------------------------- state
    def init_state(self, rng) -> TrainState:
        c = self.cfg
        v = c.model.voxel_size
        vox = jnp.zeros((1, v, v, v, c.model.initial_dim))
        proprio = jnp.zeros((1, c.model.low_dim_size))
        lang = jnp.zeros((1, c.model.lang_max_seq_len, c.model.lang_emb_dim))
        variables = self.net.init(rng, vox, proprio, lang)
        params = variables["params"]
        extra = {k: v for k, v in variables.items() if k != "params"}
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params), extra=extra)

    # -------------------------------------------------------------- step
    def _forward(self, params, extra, vox, proprio, lang, train: bool):
        variables = {"params": params, **extra}
        if "batch_stats" in extra and train:
            out, new_vars = self.net.apply(
                variables, vox, proprio, lang, train=True,
                mutable=["batch_stats"])
            return out, new_vars
        return self.net.apply(variables, vox, proprio, lang), extra

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batch (all leading dim B):
          points (B,N,3), colors (B,N,3), valid (B,N), proprio (B,7),
          lang (B,77,512), kf_xyz (B,2,3) current+next keyframe positions,
          rot_grip (B,4) int, collision (B,1) int.
        """
        c = self.cfg

        def loss_fn(params, extra):
            k_aug, _ = jax.random.split(rng)

            def aug_one(key, pts, kf):
                return apply_se3_augmentation(
                    key, pts[None], kf, self.bounds,
                    jnp.asarray(c.trans_aug_range), c.model.voxel_size,
                    symmetric_clamp=c.se3_symmetric_clamp)

            b = batch["points"].shape[0]
            if c.use_se3_aug:
                keys = jax.random.split(k_aug, b)
                aug = jax.vmap(aug_one)(keys, batch["points"], batch["kf_xyz"])
                points = aug.pcd[:, 0]
                action_trans = aug.action_trans[:, 1]   # next keyframe
                proprio_trans = aug.action_trans[:, 0]  # current keyframe
            else:
                from real_robot_nerf_actor_tpu.ops.geometry import (
                    point_to_voxel_index)
                points = batch["points"]
                idx = point_to_voxel_index(batch["kf_xyz"], c.model.voxel_size,
                                           self.bounds)
                action_trans, proprio_trans = idx[:, 1], idx[:, 0]

            proprio = jnp.concatenate(
                [proprio_trans.astype(jnp.float32),
                 batch["proprio"][:, 3:]], axis=-1)

            vox = voxelize(points, batch["colors"], self.bounds, c.voxelizer,
                           valid=batch["valid"])
            (out, new_extra) = self._forward(params, extra, vox, proprio,
                                             batch["lang"], train=True)
            q_trans, q_rot_grip, q_coll = out[:3]
            action = DiscreteAction(trans=action_trans,
                                    rot_grip=batch["rot_grip"],
                                    collision=batch["collision"])
            total, metrics = bc_losses(
                q_trans, q_rot_grip, q_coll, action, c.model.voxel_size,
                c.model.num_rotation_classes,
                q_trans_aux=out[-1] if c.model.aux_trans_head else None,
                patch_size=c.model.voxel_patch_size,
                lambda_aux=c.lambda_aux_trans,
                trans_smooth=c.trans_label_smooth, z_loss=c.z_loss)
            return total, (metrics, new_extra)

        (loss, (metrics, new_extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, extra=new_extra), metrics)

    # ------------------------------------------------------------ inference
    def predict(self, state: TrainState, vox, proprio, lang):
        out, _ = self._forward(state.params, state.extra, vox, proprio, lang,
                               train=False)
        return out

    # ---------------------------------------------------------------- data
    def synthetic_data(self, batch_size: int = 1, seed: int = 0,
                       lang_embs: Optional[np.ndarray] = None,
                       n_tasks: int = 1, n_kitchens: int = 1
                       ) -> Iterator[Dict[str, jnp.ndarray]]:
        """Host-side generator over synthetic keyframe demos (replay-style).

        n_tasks / n_kitchens > 1 reproduce the reference's multi-task /
        multi-kitchen trainers as data configs (each (kitchen, task) pair
        gets its own scene/demo and language embedding — the reference
        treats per-task CLIP features as constants,
        train_nerfact_multi_kitchen.py:1080-1253)."""
        c = self.cfg
        rng = np.random.default_rng(seed)
        combos = []
        for kitchen in range(n_kitchens):
            scene = make_synthetic_scene(seed=seed + 101 * kitchen)
            pts, cols, valid = pad_point_cloud(
                PointCloudSample(scene.points, scene.colors),
                c.voxelizer.max_num_coords)
            # device-resident once: the per-step clouds are drawn from this
            # small set, and re-uploading 220k points (~5 MB) every step
            # dominates the host loop on a remote-device link
            pts, cols, valid = (jnp.asarray(pts), jnp.asarray(cols),
                                jnp.asarray(valid))
            for task in range(n_tasks):
                demo = make_synthetic_demo(scene, seed=seed + 7 * task)
                le = (lang_embs if lang_embs is not None else
                      np.random.default_rng(1000 + task).standard_normal(
                          (c.model.lang_max_seq_len, c.model.lang_emb_dim)
                      ).astype(np.float32))
                # discretize ALL keyframes once up front: per-step jax
                # calls on tiny arrays each cost a full device dispatch
                # (~30 ms over this sandbox's tunnel)
                nk = demo.num_keyframes
                disc = discretize_action(
                    jnp.asarray(demo.xyz), jnp.asarray(demo.rotation),
                    jnp.asarray(demo.gripper_open), jnp.ones((nk,)),
                    self.bounds, c.model.voxel_size, c.rotation_resolution)
                rg_all = np.asarray(disc.rot_grip)
                coll_all = np.asarray(disc.collision)
                combos.append((pts, cols, valid, demo, le, rg_all,
                               coll_all))
        while True:
            out = {k: [] for k in ("points", "colors", "valid", "proprio",
                                   "lang", "kf_xyz", "rot_grip", "collision")}
            for _ in range(batch_size):
                pts, cols, valid, demo, lang_embs_i, rg_all, coll_all = \
                    combos[int(rng.integers(0, len(combos)))]
                n_key = demo.num_keyframes - 1
                i = int(rng.integers(0, n_key))
                proprio = np.concatenate([
                    np.zeros(3, np.float32),          # filled by aug in-step
                    np.asarray(rg_all[i], np.float32)])
                out["points"].append(pts)
                out["colors"].append(cols)
                out["valid"].append(valid)
                out["proprio"].append(proprio)
                out["lang"].append(lang_embs_i)
                out["kf_xyz"].append(np.stack([demo.xyz[i], demo.xyz[i + 1]]))
                out["rot_grip"].append(rg_all[i + 1])
                out["collision"].append(coll_all[i + 1])
            # jnp.stack keeps already-device-resident leaves (points/colors/
            # valid) on device; small host fields upload as usual
            yield {k: jnp.stack(v) for k, v in out.items()}

    def replay_data(self, root: str, n_demos: int, batch_size: int = 1,
                    seed: int = 0, lang_embs: Optional[np.ndarray] = None,
                    with_views: bool = False,
                    exclude_demos: Tuple[int, ...] = (),
                    sample_mode: str = "uniform"
                    ) -> Iterator[Dict[str, jnp.ndarray]]:
        """Batches from RECORDED demos in the reference's on-disk layout
        (the --data-root path; reference sampling loop
        train_nerfact_multi_kitchen.py:1256-1284: pick (demo, keyframe i),
        observe pcd{i}, supervise with keyframe i+1's action).

        with_views adds the per-keyframe GT view fields the nerfact joint
        loss needs: gt_rgb/gt_pose/focal (+ gt_embed/gt_depth when the
        recording carries them). Everything static is uploaded to the
        device ONCE (clouds ~5 MB, embed maps ~10 MB per view — re-sending
        them every step would dominate the host loop on a remote link).

        exclude_demos holds demo ids OUT of training (leave-one-demo-out
        evaluation: eval harnesses decode the excluded demo's transitions
        with a checkpoint that never saw them).

        sample_mode: "uniform" draws (demo, keyframe) i.i.d. per sample
        (the reference's loop). "demo_cycle" emits one random demo's FULL
        transition set (shuffled) before drawing the next demo — with
        gradient accumulation equal to transitions-per-demo every
        optimizer step then averages a whole demo, so tie-broken pairs
        (grasp/retreat keyframes whose inputs differ only in the gripper
        bit) contribute their opposing CE gradients to the SAME update
        instead of alternating and cancelling across bs=1 steps
        (round-4 BC forensics, BENCH_NOTES.md).
        """
        entry = {"root": root, "n_demos": n_demos, "lang": lang_embs,
                 "exclude_demos": tuple(exclude_demos)}
        return self.multi_replay_data([entry], batch_size, seed,
                                      with_views=with_views,
                                      sample_mode=sample_mode)

    def multi_replay_data(self, entries, batch_size: int = 1, seed: int = 0,
                          with_views: bool = False,
                          sample_mode: str = "uniform"
                          ) -> Iterator[Dict[str, jnp.ndarray]]:
        """Batches drawn across MULTIPLE recorded kitchen-task directories
        — the reference's multi-kitchen multi-task sampling loop
        (train_nerfact_multi_kitchen.py:1256-1284 draws (kitchen, task,
        demo, keyframe) per iteration, with the task's CLIP embedding as
        the lang tokens :790-795).

        entries: list of dicts {root, n_demos, lang (77, D) or None,
        exclude_demos tuple}. Each entry carries its own language
        embedding, camera calibration, and GT views; everything static is
        staged on device once (see replay_data).
        """
        from real_robot_nerf_actor_tpu.data.replay import ReplaySource

        c = self.cfg
        rng = np.random.default_rng(seed)
        zero_lang = np.zeros((c.model.lang_max_seq_len, c.model.lang_emb_dim),
                             np.float32)
        srcs = [ReplaySource(e["root"], e["n_demos"]) for e in entries]
        if with_views:
            for e, src in zip(entries, srcs):
                if not src.has_views:
                    raise ValueError(
                        f"{e['root']} has no GT views (real*/rgb*.png): "
                        "record with gen_data kitchen or train PerAct-only")
        langs = [jnp.asarray(e.get("lang") if e.get("lang") is not None
                             else zero_lang) for e in entries]

        units = []    # (entry, demo) training units
        clouds = {}   # (e, d, k) -> (points, colors, valid) device arrays
        views = {}    # (e, d, k, vi) -> dict of device arrays
        disc = {}     # (e, d) -> (rot_grip (K,4) np, collision (K,1) np)
        gt_poses = {}  # e -> (n_views, 4, 4) device
        focals = {}
        for ei, (e, src) in enumerate(zip(entries, srcs)):
            exclude = set(e.get("exclude_demos", ()))
            train_demos = [d for d in range(e["n_demos"])
                           if d not in exclude]
            assert train_demos, f"exclude_demos removed every demo of {e}"
            for d in train_demos:
                units.append((ei, d))
                demo = src.demos[d]
                nk = demo.num_keyframes
                dd = discretize_action(
                    jnp.asarray(demo.xyz), jnp.asarray(demo.rotation),
                    jnp.asarray(demo.gripper_open), jnp.ones((nk,)),
                    self.bounds, c.model.voxel_size, c.rotation_resolution)
                disc[(ei, d)] = (np.asarray(dd.rot_grip),
                                 np.asarray(dd.collision))
                for k in range(nk):
                    pts, cols, valid = pad_point_cloud(
                        src.pointcloud(d, k), c.voxelizer.max_num_coords)
                    clouds[(ei, d, k)] = (jnp.asarray(pts),
                                          jnp.asarray(cols),
                                          jnp.asarray(valid))
                    if with_views:
                        for vi in range(src.n_train_views):
                            v = src.view(d, k, vi)
                            dv = {"gt_rgb": jnp.asarray(v["rgb"])}
                            if "embed" in v:
                                dv["gt_embed"] = jnp.asarray(v["embed"])
                            if "depth" in v:
                                dv["gt_depth"] = jnp.asarray(v["depth"])
                            views[(ei, d, k, vi)] = dv
            if with_views:
                gt_poses[ei] = jnp.asarray(np.stack(
                    [src.train_pose(vi)
                     for vi in range(src.n_train_views)]))
                focals[ei] = float(src.focal)

        picks = iter_transitions(
            rng, units, lambda u: srcs[u[0]].num_keyframes(u[1]) - 1,
            sample_mode)
        while True:
            out = {k: [] for k in ("points", "colors", "valid", "proprio",
                                   "lang", "kf_xyz", "rot_grip", "collision")}
            vout: Dict[str, list] = {}
            focal_out = []
            for _ in range(batch_size):
                (ei, d), k = next(picks)
                pts, cols, valid = clouds[(ei, d, k)]
                rg_all, coll_all = disc[(ei, d)]
                out["points"].append(pts)
                out["colors"].append(cols)
                out["valid"].append(valid)
                out["proprio"].append(np.concatenate(
                    [np.zeros(3, np.float32),
                     np.asarray(rg_all[k], np.float32)]))
                out["lang"].append(langs[ei])
                out["kf_xyz"].append(np.stack(
                    [srcs[ei].demos[d].xyz[k], srcs[ei].demos[d].xyz[k + 1]]))
                out["rot_grip"].append(rg_all[k + 1])
                out["collision"].append(coll_all[k + 1])
                if with_views:
                    vi = int(rng.integers(0, srcs[ei].n_train_views))
                    for key, arr in views[(ei, d, k, vi)].items():
                        vout.setdefault(key, []).append(arr)
                    vout.setdefault("gt_pose", []).append(gt_poses[ei][vi])
                    focal_out.append(focals[ei])
            batch = {k: jnp.stack(v) for k, v in out.items()}
            for key, arrs in vout.items():
                batch[key] = jnp.stack(arrs)
            if with_views:
                batch["focal"] = jnp.asarray(focal_out, jnp.float32)
            yield batch

    def make_trainer(self, data: Optional[Iterator] = None) -> Trainer:
        return Trainer(self.cfg.train, self.train_step,
                       data or self.synthetic_data(), self.init_state)
