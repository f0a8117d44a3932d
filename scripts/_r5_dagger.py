"""Round-5 DAgger driver: plain BC on the scripted experts collapses in
closed loop on the precision tasks (golf 0.02, peg_insert 0.08 vs expert
0.86/0.95) — compounding error off the expert's state manifold. The
experts are scripted functions of the env, so expert relabeling of
learner-visited states is free — classic DAgger. Reference scope: the BC
family of src/train_bc*.py evaluated on env/robot/{golf,peg_insert}.py;
DAgger is the framework's addition (the reference has no queryable-expert
loop).

Usage: python scripts/_r5_dagger.py golf|peg_insert
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from real_robot_nerf_actor_tpu.data.demos import (
    Trajectory, generate_demonstrations, scripted_expert)
from real_robot_nerf_actor_tpu.envs.base import XArmSimEnv
from real_robot_nerf_actor_tpu.train.bc import BCTrainer, BCConfig

TASK = sys.argv[1] if len(sys.argv) > 1 else "golf"
EPLEN = {"golf": 150, "peg_insert": 400}[TASK]
EXPERT_RATE = {"golf": 0.86, "peg_insert": 0.95}[TASK]
PLAIN_BC_RATE = {"golf": 0.02, "peg_insert": 0.08}[TASK]
N_ITERS = 6
COLLECT_EPS = 40
rng = np.random.default_rng(0)

trajs = generate_demonstrations(TASK, n_demos=100, obs_mode="state",
                                episode_length=EPLEN, seed=0)
print(f"[{TASK}] expert demos: {len(trajs)} kept", flush=True)
tr = BCTrainer(BCConfig(embedding="state", obs_mode="state", batch_size=256),
               trajs[0].observations[0])
tr.fit(trajs, epochs=100)

env = XArmSimEnv(task_name=TASK, obs_mode="state", seed=7)


def rollout_collect(n_eps, seed0, mix_expert=0.1):
    """Roll the learner (with a little expert mixing), label every visited
    state with the expert's action."""
    out, succ = [], 0
    for ep in range(n_eps):
        obs, _ = env.reset(seed=seed0 + ep)
        obs_l, act_l = [], []
        ok = False
        for t in range(EPLEN):
            a_exp = np.asarray(scripted_expert(env), np.float32)
            obs_l.append(np.asarray(obs, np.float32))
            act_l.append(a_exp)
            a = a_exp if rng.random() < mix_expert else tr.act(obs)
            obs, r, term, trunc, info = env.step(np.asarray(a))
            if info.get("success"):
                ok = True
                break
        succ += ok
        out.append(Trajectory(observations=obs_l, actions=act_l,
                              rewards=[0.0] * len(obs_l),
                              gripper_open=[1.0] * len(obs_l),
                              ee_positions=[o[:3] for o in obs_l],
                              success=ok))
    return out, succ / n_eps


agg = list(trajs)
for it in range(N_ITERS):
    new, rate = rollout_collect(COLLECT_EPS, seed0=10_000 + 1000 * it)
    agg += new
    print(f"[dagger {it}] rollout success {rate:.2f} | dataset "
          f"{sum(len(t.observations) for t in agg)} steps", flush=True)
    tr.fit(agg, epochs=30)

succ = []
for ep in range(50):
    obs, _ = env.reset(seed=5000 + ep)
    ok = False
    for t in range(EPLEN):
        obs, r, term, trunc, info = env.step(np.asarray(tr.act(obs)))
        if info.get("success"):
            ok = True
            break
    succ.append(ok)
rate = float(np.mean(succ))
print(f"[{TASK}] DAgger BC success rate (50 eps): {rate}", flush=True)
json.dump({"task": TASK, "algo": "dagger_bc_state",
           "n_expert_demos": len(trajs), "dagger_iters": N_ITERS,
           "collect_eps_per_iter": COLLECT_EPS, "eval_episodes": 50,
           "episode_length": EPLEN,
           "expert_success_rate": EXPERT_RATE,
           "plain_bc_success_rate": PLAIN_BC_RATE,
           "success_rate": rate,
           "note": "plain BC drifts off the expert's state manifold "
                   "(precision interception/insertion); DAgger relabels "
                   "learner-visited states with the scripted expert"},
          open(f"artifacts/round5_envpolicies/metrics_dagger_{TASK}.json",
               "w"), indent=1)
