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
    if args.data_root:
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
            assert len(nt) == 1, (
                "demo_cycle window alignment needs equal-length demos; "
                f"got transition counts {sorted(nt)}")
            per_demo = nt.pop()
            residue = (-args.batch_size) % per_demo   # samples to finish
            assert residue % args.batch_size == 0, (
                f"batch_size {args.batch_size} cannot realign to the "
                f"{per_demo}-transition demo cycle")
            for _ in range(residue // args.batch_size):
                next(data)
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
