#!/usr/bin/env python
"""Device-trace profiler for the voxel policy forward.

Captures a jax.profiler trace of the serving-scale PerceiverIO forward
(bench.py's bench_policy graph) and aggregates device-lane op durations by
op class (fusion / copy / convolution / transpose / ...) and by individual
op, printing the top offenders. This is the trace-driven view behind the
round-2/3 layout findings in BENCH_NOTES.md (the ~30 ms of layout copies
around the 100^3 convs).

Usage (real TPU): python scripts/profile_policy.py [--dtype bfloat16]
        [--variant default|noupsample] [--out /tmp/policy_trace]
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def aggregate_trace(log_dir: str, min_ms: float = 0.2):
    """Parse the perfetto trace.json.gz jax.profiler wrote and sum device
    op durations (the TensorCore lanes), grouped by op class and name."""
    paths = sorted(glob.glob(os.path.join(
        log_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # device lanes: pid names containing 'TPU' / 'XLA Ops' tracks
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")
    by_name = defaultdict(float)
    by_class = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = tid_name.get((e.get("pid"), e.get("tid")), "")
        proc = pid_name.get(e.get("pid"), "")
        if "TPU" not in proc and "XLA Ops" not in lane:
            continue
        if "XLA Ops" not in lane and "Steps" in lane:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        cls = re.split(r"[.\d]", name)[0]
        by_class[cls] += dur
        total += dur
    return total, by_class, by_name


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/policy_trace")
    ap.add_argument("--n-inner", type=int, default=4)
    ap.add_argument("--upsample-mode", default=None,
                    help="override PerceiverConfig.upsample_mode")
    ap.add_argument("--conv-backend", default=None,
                    help="override PerceiverConfig.conv_backend "
                         "(xla|pallas|conv2d)")
    ap.add_argument("--pointwise", action="store_true",
                    help="enable blocks.POINTWISE_LOWERING")
    ap.add_argument("--shuffle-transpose", action="store_true",
                    help="enable blocks.SHUFFLE_TRANSPOSE_LOWERING")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.models import PerceiverConfig, PerceiverIO
    from real_robot_nerf_actor_tpu.ops import choose_highest_action

    kw = dict(depth=6, voxel_size=100, num_latents=2048, latent_dim=512,
              compute_dtype=args.dtype)
    if args.upsample_mode:
        kw["upsample_mode"] = args.upsample_mode
    if args.conv_backend:
        kw["conv_backend"] = args.conv_backend
    if args.pointwise or args.shuffle_transpose:
        from real_robot_nerf_actor_tpu.models import blocks
        blocks.POINTWISE_LOWERING = args.pointwise
        blocks.SHUFFLE_TRANSPOSE_LOWERING = args.shuffle_transpose
    cfg = PerceiverConfig(**kw)
    net = PerceiverIO(cfg)
    v = cfg.voxel_size
    vox = jax.random.normal(jax.random.key(0), (1, v, v, v, cfg.initial_dim))
    proprio = jnp.zeros((1, cfg.low_dim_size))
    lang = jax.random.normal(jax.random.key(1),
                             (1, cfg.lang_max_seq_len, cfg.lang_emb_dim))
    params = net.init(jax.random.key(2), vox, proprio, lang)

    n = args.n_inner

    @jax.jit
    def repeat_act(params, vox, proprio, lang):
        def body(carry, i):
            q_trans, q_rot_grip, q_coll = net.apply(
                params, vox + i.astype(vox.dtype) * 1e-6, proprio, lang)
            coords, rot_grip, _ = choose_highest_action(
                q_trans, q_rot_grip, q_coll)
            return carry + jnp.sum(coords) + jnp.sum(rot_grip), None

        total, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(n))
        return total

    int(repeat_act(params, vox, proprio, lang))  # compile
    jax.profiler.start_trace(args.out)
    int(repeat_act(params, vox, proprio, lang))
    jax.profiler.stop_trace()

    total, by_class, by_name = aggregate_trace(args.out)
    print(f"\ndevice total {total:.1f} ms over {n} iterations "
          f"= {total / n:.2f} ms/action\n")
    print("-- by op class (ms, per action) --")
    for k_, v_ in sorted(by_class.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {k_:28s} {v_ / n:8.3f}")
    print(f"\n-- top {args.top} ops (ms, per action) --")
    for k_, v_ in sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {k_:48s} {v_ / n:8.3f}")


if __name__ == "__main__":
    main()
