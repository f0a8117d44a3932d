#!/usr/bin/env python
"""Per-transition BC decode dump for a trained nerfact/peract checkpoint.

Prints, for every (demo, keyframe) transition of a recorded dataset, the
predicted vs expected translation voxel, rotation bins and gripper — the
magnifying glass behind eval_quality's aggregates (round-4: the flagship's
exact-match oscillation localized to specific keyframe indices; this shows
which and how far).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--ckpt-dir", required=True)
    group = ap.add_mutually_exclusive_group(required=True)
    group.add_argument("--data-root")
    group.add_argument("--multi-root",
                       help="multi-kitchen dataset root (manifest.json + "
                            "lang_embs.npz): dumps every (kitchen, task, "
                            "demo, keyframe) with its task's lang tokens")
    ap.add_argument("--n-demos", type=int, default=5)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from real_robot_nerf_actor_tpu.data.replay import (ReplaySource,
                                                       pad_point_cloud)
    from real_robot_nerf_actor_tpu.ops import (choose_highest_action,
                                               discretize_action, voxelize)
    from real_robot_nerf_actor_tpu.ops.geometry import point_to_voxel_index
    from real_robot_nerf_actor_tpu.train import NerfActConfig, NerfActTrainer
    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager
    from real_robot_nerf_actor_tpu.utils.config import load_config

    cfg = load_config(NerfActConfig, args.config, args.override)
    tr = NerfActTrainer(cfg)
    state = tr.init_state(jax.random.key(0))
    restored = CheckpointManager(args.ckpt_dir).restore(state, params_only=True)
    assert restored is not None, "no checkpoint found"
    state = restored
    print(f"checkpoint step {int(state.step)}")

    c = cfg.peract
    zero_lang = jnp.zeros((1, c.model.lang_max_seq_len, c.model.lang_emb_dim))
    if args.multi_root:
        from real_robot_nerf_actor_tpu.data.multitask import (
            load_multitask_entries)
        entries = load_multitask_entries(args.multi_root)
        jobs = [(f"k{e['kitchen']}_t{e['task']} ",
                 ReplaySource(e["root"], e["n_demos"]),
                 jnp.asarray(e["lang"])[None]) for e in entries]
    else:
        jobs = [("", ReplaySource(args.data_root, args.n_demos), zero_lang)]

    @jax.jit
    def decode(pts, cols, valid, proprio, lang):
        vox = voxelize(pts, cols, tr.bounds, c.voxelizer, valid=valid)
        out, _ = tr._forward(state.params["policy"], state.extra, vox,
                             proprio, lang, train=False)
        coords, rot_grip, _ = choose_highest_action(
            out[0], out[1], out[2], c.rotation_resolution)
        return coords[0], rot_grip[0]

    for prefix, src, lang in jobs:
        for d in range(len(src.demos)):
            demo = src.demos[d]
            nk = demo.num_keyframes
            dd = discretize_action(
                jnp.asarray(demo.xyz), jnp.asarray(demo.rotation),
                jnp.asarray(demo.gripper_open), jnp.ones((nk,)),
                tr.bounds, c.model.voxel_size, c.rotation_resolution)
            ti = np.asarray(point_to_voxel_index(
                jnp.asarray(demo.xyz), c.model.voxel_size, tr.bounds))
            rg = np.asarray(dd.rot_grip)
            for k in range(nk - 1):
                pts, cols, valid = pad_point_cloud(
                    src.pointcloud(d, k), c.voxelizer.max_num_coords)
                proprio = jnp.asarray(np.concatenate(
                    [ti[k].astype(np.float32),
                     rg[k].astype(np.float32)])[None])
                got_t, got_rg = decode(jnp.asarray(pts)[None],
                                       jnp.asarray(cols)[None],
                                       jnp.asarray(valid)[None], proprio,
                                       lang)
                got_t, got_rg = np.asarray(got_t), np.asarray(got_rg)
                want_t, want_rg = ti[k + 1], rg[k + 1]
                dist = float(np.linalg.norm(got_t - want_t))
                mark = "OK " if dist == 0 else f"{dist:5.1f}"
                print(f"{prefix}d{d} k{k}: pred {got_t.tolist()}"
                      f" want {want_t.tolist()}"
                      f" [{mark}] grip {int(got_rg[3])}/{int(want_rg[3])}"
                      f" rot {got_rg[:3].tolist()}/{want_rg[:3].tolist()}"
                      f" proprio_t {ti[k].tolist()} g{int(rg[k][3])}")


if __name__ == "__main__":
    main()
