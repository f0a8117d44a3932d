"""Round-5 golf BC: corner-dribble expert demos -> state BC -> 50-ep eval."""
import json
import numpy as np
from real_robot_nerf_actor_tpu.data.demos import (
    generate_demonstrations, scripted_expert)
from real_robot_nerf_actor_tpu.envs import make_env
from real_robot_nerf_actor_tpu.envs.base import XArmSimEnv
from real_robot_nerf_actor_tpu.train.bc import BCTrainer, BCConfig

EPLEN = 150
trajs = generate_demonstrations("golf", n_demos=100, obs_mode="state",
                                episode_length=EPLEN, seed=0)
print(f"[golf] expert demos: {len(trajs)} kept", flush=True)
tr = BCTrainer(BCConfig(embedding="state", obs_mode="state", batch_size=256),
               trajs[0].observations[0])
tr.fit(trajs, epochs=200)
env = XArmSimEnv(task_name="golf", obs_mode="state", seed=123)
succ = []
for ep in range(50):
    obs, _ = env.reset(seed=5000 + ep)
    ok = False
    for t in range(EPLEN):
        a = tr.act(obs)
        obs, r, term, trunc, info = env.step(np.asarray(a))
        if info.get("success"):
            ok = True
            break
    succ.append(ok)
rate = float(np.mean(succ))
print(f"[golf] BC success rate (50 eps): {rate}", flush=True)
json.dump({"task": "golf", "algo": "bc_state", "n_demos": len(trajs),
           "epochs": 200, "eval_episodes": 50, "episode_length": EPLEN,
           "expert_success_rate_50eps": 0.86,
           "success_rate": rate,
           "note": "corner-guided dribble expert on the reference-parity "
                   "mass-2 ball (golf.xml:40); ball planar velocity added "
                   "to GolfTask.extra_obs so the wait/chase behavior is "
                   "observable"},
          open("artifacts/round5_envpolicies/metrics_bc_golf.json", "w"),
          indent=1)
