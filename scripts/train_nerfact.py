#!/usr/bin/env python
"""NeRF-Actor joint training driver (reference train_nerfact_* family):
PerAct BC + lambda_nerf * neural-rendering loss on the policy voxel features.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML/JSON NerfActConfig")
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--data-root", default=None,
                    help="recorded-demo dir: calibration.json + "
                         "{d}_xarm_position.txt + real{d}/{pcd,rgb}{k}.* "
                         "(reference layout; scripts/gen_data.py kitchen)")
    ap.add_argument("--multi-root", default=None,
                    help="multi-kitchen multi-task dataset root "
                         "(manifest.json + lang_embs.npz + k{i}_t{j}/ — "
                         "scripts/gen_data.py multikitchen). Trains ONE "
                         "language-conditioned joint checkpoint over every "
                         "(kitchen, task); the reference's namesake "
                         "workload (train_nerfact_multi_kitchen.py:1080)")
    ap.add_argument("--n-demos", type=int, default=5)
    ap.add_argument("--exclude-demos", default="",
                    help="comma list of demo ids held OUT of training "
                         "(leave-one-demo-out eval; their BC decode is "
                         "reported as bc_holdout_* every eval)")
    ap.add_argument("--eval-save-dir", default=None,
                    help="save render panels here every eval interval")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--sample-mode", default="uniform",
                    choices=["uniform", "demo_cycle"],
                    help="demo_cycle: emit one demo's full transition set "
                         "per accumulation window (pairs grasp/retreat "
                         "gradients in one update; see BENCH_NOTES r4)")
    ap.add_argument("--init-policy-from", default=None,
                    help="ckpt dir whose params['policy'] subtree seeds a "
                         "FRESH run (cross-config warm start: keep the "
                         "trained voxel policy, retrain the nerf field — "
                         "e.g. a use_viewdirs/multi-view field change)")
    ap.add_argument("--init-params-from", default=None,
                    help="ckpt dir whose FULL params tree (policy + nerf) "
                         "warm-starts a fresh run by recursive merge: "
                         "matching-shape leaves copy over, new leaves (an "
                         "arch delta like model.aux_trans_head) keep their "
                         "fresh init. Fresh optimizer state + schedule.")
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import dataclasses
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.utils.config import load_config

    cfg = load_config(NerfActConfig, args.config, args.override)
    tcfg = cfg.peract.train
    if args.steps is not None:
        tcfg = dataclasses.replace(tcfg, num_steps=args.steps)
    tcfg = dataclasses.replace(tcfg, ckpt_dir=args.ckpt_dir or tcfg.ckpt_dir,
                               log_dir=args.log_dir or tcfg.log_dir)
    cfg = dataclasses.replace(
        cfg, peract=dataclasses.replace(cfg.peract, train=tcfg))

    tr = NerfActTrainer(cfg)
    if args.init_params_from:
        import jax
        import jax.numpy as jnp
        from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager
        assert tcfg.ckpt_dir, "--init-params-from needs --ckpt-dir"
        mgr = CheckpointManager(tcfg.ckpt_dir)
        if mgr.latest_step() is None:
            donor = CheckpointManager(
                args.init_params_from).restore_raw_params()
            assert donor is not None, f"no ckpt in {args.init_params_from}"

            stats = {"copied": 0, "fresh": 0}

            def merge(fresh, d):
                if isinstance(fresh, dict):
                    return {k: (merge(v, d[k]) if isinstance(d, dict)
                                and k in d else (stats.__setitem__(
                                    "fresh", stats["fresh"] + 1) or v))
                            for k, v in fresh.items()}
                if (hasattr(d, "shape") and hasattr(fresh, "shape")
                        and d.shape == fresh.shape):
                    stats["copied"] += 1
                    return jnp.asarray(d, fresh.dtype)
                stats["fresh"] += 1
                return fresh

            _, init_rng = jax.random.split(jax.random.key(tcfg.seed))
            state = tr.init_state(init_rng)
            params = merge(state.params, donor)
            mgr.save(0, state.replace(params=params,
                                      step=jnp.zeros_like(state.step)))
            print(f"[init] merged {stats['copied']} leaves from "
                  f"{args.init_params_from} ({stats['fresh']} fresh) into "
                  "step-0 checkpoint")
    if args.init_policy_from:
        import jax
        import jax.numpy as jnp
        from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager
        assert tcfg.ckpt_dir, "--init-policy-from needs --ckpt-dir"
        mgr = CheckpointManager(tcfg.ckpt_dir)
        if mgr.latest_step() is None:
            donor = CheckpointManager(
                args.init_policy_from).restore_raw_params()
            assert donor is not None, f"no ckpt in {args.init_policy_from}"
            _, init_rng = jax.random.split(jax.random.key(tcfg.seed))
            state = tr.init_state(init_rng)
            params = dict(state.params)
            params["policy"] = donor["policy"]
            mgr.save(0, state.replace(params=params,
                                      step=jnp.zeros_like(state.step)))
            print(f"[init] grafted policy subtree from "
                  f"{args.init_policy_from} into step-0 checkpoint")
    if args.multi_root:
        from real_robot_nerf_actor_tpu.data.multitask import (
            load_multitask_entries)
        exclude = tuple(int(x) for x in args.exclude_demos.split(",") if x)
        entries = load_multitask_entries(args.multi_root,
                                         exclude_demos=exclude)
        data = tr.multi_replay_data(entries, args.batch_size,
                                    sample_mode=args.sample_mode)
        if args.sample_mode == "demo_cycle":
            from real_robot_nerf_actor_tpu.data.replay import ReplaySource
            nt = set()
            for e in entries:
                src = ReplaySource(e["root"], e["n_demos"])
                nt |= {src.num_keyframes(d) - 1 for d in range(e["n_demos"])
                       if d not in e["exclude_demos"]}
            if len(nt) != 1:
                raise SystemExit(
                    "--sample-mode demo_cycle needs equal-length demos; "
                    f"got transition counts {sorted(nt)}")
            per_demo = nt.pop()
            window = tcfg.optim.accum_steps * args.batch_size
            if window != per_demo:
                print(f"[warn] demo_cycle: optimizer window {window} != "
                      f"{per_demo} transitions/demo — set "
                      f"peract.train.optim.accum_steps="
                      f"{per_demo // max(1, args.batch_size)}")
        eval_fn = tr.make_multi_replay_eval(entries,
                                            save_dir=args.eval_save_dir)
        trainer = tr.make_trainer(data, eval_fn=eval_fn)
    elif args.data_root:
        exclude = tuple(int(x) for x in args.exclude_demos.split(",") if x)
        data = tr.replay_data(args.data_root, args.n_demos, args.batch_size,
                              exclude_demos=exclude,
                              sample_mode=args.sample_mode)
        eval_batch = next(data)  # one fixed batch for the periodic render
        if args.sample_mode == "demo_cycle":
            # realign to a cycle boundary: taking the eval batch consumed
            # one sample of the first demo's cycle, which would shift
            # every accumulation window across two demos and silently
            # break the grasp/retreat pairing the mode exists for
            from real_robot_nerf_actor_tpu.data.replay import ReplaySource
            src = ReplaySource(args.data_root, args.n_demos)
            nt = {src.num_keyframes(d) - 1 for d in range(args.n_demos)
                  if d not in exclude}
            if len(nt) != 1:
                raise SystemExit(
                    "--sample-mode demo_cycle needs equal-length demos so "
                    "accumulation windows align to demo boundaries; got "
                    f"transition counts {sorted(nt)}. Use uniform sampling "
                    "or re-record with a fixed keyframe count.")
            per_demo = nt.pop()
            residue = (-args.batch_size) % per_demo   # samples to finish
            if residue % args.batch_size != 0:
                raise SystemExit(
                    f"batch_size {args.batch_size} cannot realign to the "
                    f"{per_demo}-transition demo cycle; pick a batch size "
                    f"that divides {per_demo}")
            for _ in range(residue // args.batch_size):
                next(data)
            # the mode's whole point is one optimizer update per demo:
            # accumulation window (accum_steps * batch_size) must cover
            # exactly one cycle, else grasp/retreat pairs straddle updates
            window = tcfg.optim.accum_steps * args.batch_size
            if window != per_demo:
                print(f"[warn] demo_cycle: optimizer window {window} "
                      f"(accum_steps {tcfg.optim.accum_steps} x batch "
                      f"{args.batch_size}) != {per_demo} transitions/demo "
                      "— grasp/retreat pairs will straddle updates; set "
                      f"peract.train.optim.accum_steps="
                      f"{per_demo // max(1, args.batch_size)}")
        eval_fn = tr.make_replay_eval(args.data_root, args.n_demos,
                                      exclude_demos=exclude,
                                      save_dir=args.eval_save_dir,
                                      eval_batch=eval_batch)
        trainer = tr.make_trainer(data, eval_fn=eval_fn)
    else:
        data = tr.synthetic_data(batch_size=args.batch_size)
        trainer = tr.make_trainer(data, eval_save_dir=args.eval_save_dir)
    trainer.run(resume=not args.no_resume)


if __name__ == "__main__":
    main()
