#!/usr/bin/env python
"""Gradient forensics for nonfinite-update bursts (BENCH_NOTES round 5).

The round-5 multitask fine-tunes produced bursts of nonfinite gradients
at bs=1/accum=1 (ft1/ft2 NaN'd; ft3 survived via OptimConfig.skip_nonfinite
but logged 631 dropped updates). This tool finds WHERE they come from.

Phase 1 (--mode replay): restore a mid-run checkpoint, replay the exact
training stream (data + per-step rng fast-forwarded to the checkpoint
step), and stash every batch whose gradient the nonfinite guard rejects
(opt_state.total_notfinite increments) together with the pre-step params.
Uses the production train_step unmodified, so the replay is the run.

Phase 2 (--mode dissect): for one stash, recompute per-loss-term
gradients (trans CE / rot+grip CE / aux trans CE / render) on the exact
(params, batch, rng) triple and report which parameter subtrees go
nonfinite under which term, plus forward-magnitude probes (logit spread,
voxel-feature range) — localizing the producing op.

Example (ft3 window):
  python scripts/grad_forensics.py --mode replay \
      --config configs/nerfact.yaml --multi-root datasets/multikitchen_r5b \
      --exclude-demos 3 --ckpt-dir artifacts/round5_multitask_ft3/ckpt \
      --replay-steps 1100 --out /tmp/gradf \
      -o renderer.image_width=80 -o renderer.image_height=60 \
      -o peract.voxelizer.max_num_coords=65536 \
      -o peract.model.aux_trans_head=true \
      -o peract.model.grip_proprio_scale=25 \
      -o peract.train.optim.accum_steps=1 -o peract.train.optim.lr=3e-5 \
      -o peract.train.optim.grad_clip=1.0 \
      -o peract.train.optim.schedule=cosine \
      -o peract.train.optim.warmup_steps=250 \
      -o peract.train.optim.decay_steps=12000
  python scripts/grad_forensics.py --mode dissect --stash /tmp/gradf/stash_step2716.npz [same config flags]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(args):
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.utils.config import load_config
    from real_robot_nerf_actor_tpu.data.multitask import (
        load_multitask_entries)

    cfg = load_config(NerfActConfig, args.config, args.override)
    tr = NerfActTrainer(cfg)
    exclude = tuple(int(x) for x in args.exclude_demos.split(",") if x)
    entries = load_multitask_entries(args.multi_root, exclude_demos=exclude)
    return tr, entries


def flatten(tree, prefix=""):
    import jax
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        out[prefix + name] = leaf
    return out


def replay(args):
    import jax
    import numpy as np

    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager

    tr, entries = build(args)
    seed = tr.cfg.train.seed
    data = tr.multi_replay_data(entries, args.batch_size)
    mgr = CheckpointManager(args.ckpt_dir)
    from_step = (args.from_step if args.from_step is not None
                 else mgr.latest_step())
    assert from_step is not None, f"no checkpoint in {args.ckpt_dir}"

    # rng chain exactly as Trainer.run: key(seed) -> one init split ->
    # one split per loop iteration
    rng = jax.random.key(seed)
    rng, init_rng = jax.random.split(rng)
    state = mgr.restore(tr.init_state(init_rng), step=from_step)
    assert int(state.step) == from_step, (int(state.step), from_step)
    print(f"[replay] restored step {from_step} from {args.ckpt_dir}")
    for i in range(from_step):
        next(data)
        rng, _ = jax.random.split(rng)
    print(f"[replay] fast-forwarded {from_step} batches + rng splits")

    # donate OFF: the pre-step state must stay alive to stash it
    step_fn = jax.jit(tr.train_step)
    os.makedirs(args.out, exist_ok=True)
    tn_prev = float(state.opt_state.total_notfinite)
    stashed = 0
    events = []
    for step in range(from_step, from_step + args.replay_steps):
        batch = next(data)
        rng, step_rng = jax.random.split(rng)
        new_state, metrics = step_fn(state, batch, step_rng)
        tn = float(new_state.opt_state.total_notfinite)
        if tn > tn_prev:
            events.append(step)
            print(f"[replay] step {step}: NONFINITE grad "
                  f"(total {tn_prev:.0f} -> {tn:.0f}), "
                  f"loss={float(metrics['loss_total']):.3f}")
            if stashed < args.max_stash:
                path = os.path.join(args.out, f"stash_step{step}.npz")
                payload = {f"batch/{k}": np.asarray(v)
                           for k, v in batch.items()}
                payload.update({f"params/{k}": np.asarray(v) for k, v in
                                flatten(state.params).items()})
                payload.update({f"extra/{k}": np.asarray(v) for k, v in
                                flatten(state.extra).items()} if
                               state.extra is not None else {})
                payload["rng_key_data"] = np.asarray(
                    jax.random.key_data(step_rng))
                payload["step"] = np.asarray(step)
                np.savez_compressed(path, **payload)
                print(f"[replay] stashed pre-step params + batch -> {path}")
                stashed += 1
        elif (step + 1) % 50 == 0:
            print(f"[replay] step {step + 1} ok | "
                  f"loss={float(metrics['loss_total']):.3f} | skips={tn:.0f}")
        tn_prev = tn
        state = new_state
    with open(os.path.join(args.out, "events.json"), "w") as f:
        json.dump({"from_step": from_step, "events": events}, f)
    print(f"[replay] done: {len(events)} nonfinite steps in "
          f"[{from_step}, {from_step + args.replay_steps})")


def dissect(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real_robot_nerf_actor_tpu.ops.action_codec import DiscreteAction
    from real_robot_nerf_actor_tpu.ops.se3_aug import apply_se3_augmentation
    from real_robot_nerf_actor_tpu.ops.voxelize import voxelize
    from real_robot_nerf_actor_tpu.train.peract import bc_losses

    tr, _ = build(args)
    c = tr.cfg
    jc = tr.jcfg
    z = np.load(args.stash)
    batch = {k[len("batch/"):]: jnp.asarray(v) for k, v in z.items()
             if k.startswith("batch/")}
    flat_params = {k[len("params/"):]: v for k, v in z.items()
                   if k.startswith("params/")}
    step_rng = jax.random.wrap_key_data(jnp.asarray(z["rng_key_data"]))
    print(f"[dissect] stash step {int(z['step'])}, "
          f"{len(flat_params)} param leaves")

    # rebuild the params pytree from flat paths using a template
    state_tpl = tr.init_state(jax.random.key(0))
    template = state_tpl.params
    tpl_flat = flatten(template)
    assert set(tpl_flat) == set(flat_params), "param structure mismatch"
    treedef = jax.tree_util.tree_structure(template)
    # tree_unflatten needs leaves in tree order, not sorted order
    leaves_tree_order = [jnp.asarray(flat_params[k])
                         for k in flatten(template)]
    params = jax.tree_util.tree_unflatten(treedef, leaves_tree_order)
    extra = state_tpl.extra  # flagship nerfact: no batch_stats ({} here)

    TERMS = ("loss_trans", "loss_rot_grip", "loss_trans_aux", "loss_render")

    def loss_terms(p):
        # mirrors NerfActTrainer.train_step loss_fn (train/nerfact.py:69)
        k_aug, k_render = jax.random.split(step_rng)
        b = batch["points"].shape[0]

        def aug_one(key, pts, kf):
            return apply_se3_augmentation(
                key, pts[None], kf, tr.bounds,
                jnp.asarray(c.trans_aug_range), c.model.voxel_size,
                symmetric_clamp=c.se3_symmetric_clamp)

        if c.use_se3_aug:
            keys = jax.random.split(k_aug, b)
            aug = jax.vmap(aug_one)(keys, batch["points"], batch["kf_xyz"])
            points = aug.pcd[:, 0]
            action_trans = aug.action_trans[:, 1]
            proprio_trans = aug.action_trans[:, 0]
            gt_pose = batch["gt_pose"].at[:, :3, 3].add(aug.shift)
        else:
            raise SystemExit("dissect expects use_se3_aug=true configs")
        proprio = jnp.concatenate(
            [proprio_trans.astype(jnp.float32), batch["proprio"][:, 3:]],
            axis=-1)
        vox = voxelize(points, batch["colors"], tr.bounds, c.voxelizer,
                       valid=batch["valid"])
        out, _ = tr._forward(p["policy"], extra, vox, proprio,
                             batch["lang"], train=True)
        q_trans, q_rot_grip, q_coll, voxel_feat = out[:4]
        action = DiscreteAction(trans=action_trans,
                                rot_grip=batch["rot_grip"],
                                collision=batch["collision"])
        _, metrics = bc_losses(
            q_trans, q_rot_grip, q_coll, action, c.model.voxel_size,
            c.model.num_rotation_classes,
            q_trans_aux=out[4] if c.model.aux_trans_head else None,
            patch_size=c.model.voxel_patch_size,
            lambda_aux=c.lambda_aux_trans,
            trans_smooth=c.trans_label_smooth)
        render_loss, rmetrics = tr.renderer.rendering_loss(
            {"params": p["nerf"]}, voxel_feat[:1], batch["gt_rgb"][:1],
            gt_pose[:1], batch["focal"][0], k_render,
            gt_embed=batch.get("gt_embed"), gt_depth=batch.get("gt_depth"))
        metrics.update(rmetrics)
        terms = jnp.stack([metrics.get(t, jnp.float32(0.0)) for t in TERMS])
        probes = jnp.stack([
            jnp.max(jnp.abs(q_trans)), jnp.max(jnp.abs(q_rot_grip)),
            jnp.max(jnp.abs(voxel_feat)),
            jnp.max(jnp.abs(out[4])) if c.model.aux_trans_head
            else jnp.float32(0.0)])
        return terms, probes

    # ONE compiled program: gradient of a w-weighted term sum; one-hot w
    # isolates each term without materializing 4 full gradients at once
    # (a jacrev over all terms OOMs HBM at 100^3 flagship scale)
    print("[dissect] compiling weighted-term gradient (fresh program)...")
    grad_fn = jax.jit(jax.grad(
        lambda p, w: jnp.sum(w * loss_terms(p)[0]), argnums=0))
    fwd = jax.jit(loss_terms)
    terms, probes = fwd(params)
    terms = np.asarray(terms)
    probes = np.asarray(probes)
    jac = {t: grad_fn(params, jnp.zeros(len(TERMS)).at[i].set(1.0))
           for i, t in enumerate(TERMS)}
    print(f"[dissect] loss terms: "
          + ", ".join(f"{t}={v:.3f}" for t, v in zip(TERMS, terms)))
    print(f"[dissect] forward probes: max|q_trans|={probes[0]:.1f} "
          f"max|q_rot_grip|={probes[1]:.1f} max|voxel_feat|={probes[2]:.1f} "
          f"max|q_trans_aux|={probes[3]:.1f}")

    report = {}
    for t in TERMS:
        for name, gi in flatten(jac[t]).items():
            gi = np.asarray(gi)
            bad = int(np.size(gi) - np.isfinite(gi).sum())
            if bad:
                fin = gi[np.isfinite(gi)]
                report.setdefault(t, []).append(
                    (name, bad, float(np.abs(fin).max()) if fin.size else 0))
    if not report:
        print("[dissect] NO nonfinite per-term gradients — the combined "
              "backward must interact (run with --combined to check)")
    for t, rows in report.items():
        rows.sort(key=lambda r: -r[1])
        print(f"[dissect] term {t}: {len(rows)} leaves nonfinite")
        for name, bad, mx in rows[:12]:
            print(f"    {name}: {bad} bad, max|finite|={mx:.3e}")
    out = {t: [(n, b, m) for n, b, m in rows] for t, rows in report.items()}
    with open(args.stash.replace(".npz", "_dissect.json"), "w") as f:
        json.dump({"terms": {t: float(v) for t, v in zip(TERMS, terms)},
                   "probes": probes.tolist(), "nonfinite": out}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["replay", "dissect"], required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--multi-root", required=True)
    ap.add_argument("--exclude-demos", default="")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--from-step", type=int, default=None)
    ap.add_argument("--replay-steps", type=int, default=1000)
    ap.add_argument("--max-stash", type=int, default=2)
    ap.add_argument("--out", default="/tmp/gradf")
    ap.add_argument("--stash", default=None)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    if args.mode == "replay":
        assert args.ckpt_dir, "--mode replay needs --ckpt-dir"
        replay(args)
    else:
        assert args.stash, "--mode dissect needs --stash"
        dissect(args)


if __name__ == "__main__":
    main()
