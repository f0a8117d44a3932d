#!/usr/bin/env python
"""SAC RL training on the sim suite (reference src/train_rl.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="reach")
    ap.add_argument("--obs-mode", default="state", choices=["state", "image"])
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--seed-steps", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--episode-length", type=int, default=50)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--prioritized", action="store_true")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--final-eval-episodes", type=int, default=0,
                    help="after training, measure success over N fresh "
                         "episodes and write it to --out (the reference's "
                         "env-success evaluation protocol, src/train_bc.py"
                         ":42-77 / train_rl.py)")
    ap.add_argument("--out", default=None,
                    help="write {task, steps, final_success_rate, ...} JSON")
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    from real_robot_nerf_actor_tpu.envs import make_env
    from real_robot_nerf_actor_tpu.rl import (
        PrioritizedReplayBuffer, ReplayBuffer, SACAgent, SACConfig)
    from real_robot_nerf_actor_tpu.utils.logger import Logger

    env = make_env(task_name=args.task, obs_mode=args.obs_mode,
                   episode_length=args.episode_length)
    obs, _ = env.reset(seed=0)
    action_dim = int(np.prod(env.action_space.shape))
    agent = SACAgent(SACConfig(action_dim=action_dim,
                               obs_type=args.obs_mode), obs)
    buf_cls = PrioritizedReplayBuffer if args.prioritized else ReplayBuffer
    rb = buf_cls(100000, obs.shape, action_dim)
    logger = Logger(args.log_dir, print_every=100)

    ep_ret, ep = 0.0, 0
    for step in range(args.steps):
        a = (env.action_space.sample() if step < args.seed_steps
             else agent.sample_action(obs))
        nobs, r, term, trunc, info = env.step(a)
        rb.add(obs, a, r, nobs, term)
        ep_ret += r
        obs = nobs
        if term or trunc:
            logger.log({"episode_return": ep_ret,
                        "success": float(info.get("episode_success", 0))},
                       step)
            obs, _ = env.reset(seed=ep)
            ep += 1
            ep_ret = 0.0
        if step >= args.seed_steps:
            batch = rb.sample(args.batch_size)
            m = agent.update(batch)
            rb.update_priorities(batch["idx"], m.pop("td_abs"))
            if step % 100 == 0:
                logger.log({k: v for k, v in m.items()}, step)
        if (step + 1) % args.eval_every == 0:
            succ = 0
            for e in range(5):
                o, _ = env.reset(seed=10000 + e)
                for _ in range(args.episode_length):
                    o, r, tm, tc, inf = env.step(agent.select_action(o))
                    if tm or tc:
                        break
                succ += float(inf.get("episode_success", 0))
            logger.log({"eval_success_rate": succ / 5}, step + 1,
                       category="eval")
            obs, _ = env.reset(seed=ep)

    if args.final_eval_episodes > 0:
        succ, rets = 0.0, []
        for e in range(args.final_eval_episodes):
            o, _ = env.reset(seed=20000 + e)
            ret = 0.0
            for _ in range(args.episode_length):
                o, r, tm, tc, inf = env.step(agent.select_action(o))
                ret += r
                if tm or tc:
                    break
            succ += float(inf.get("episode_success", 0))
            rets.append(ret)
        rate = succ / args.final_eval_episodes
        print(f"[rl] final success over {args.final_eval_episodes} eps: "
              f"{rate:.2f}")
        if args.out:
            import json
            os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"task": args.task, "algo": "sac",
                           "obs_mode": args.obs_mode,
                           "train_steps": args.steps,
                           "final_eval_episodes": args.final_eval_episodes,
                           "final_success_rate": rate,
                           "mean_return": float(np.mean(rets))}, f, indent=1)


if __name__ == "__main__":
    main()
