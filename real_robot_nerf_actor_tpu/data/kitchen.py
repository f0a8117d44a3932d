"""Kitchen-demo dataset writer: records demos in the REFERENCE's on-disk
layout so the replay/training path exercises the exact real-data format.

Layout written (matching what /root/reference/train_nerfact_multi_kitchen.py
:1256-1284 consumes):

    out/
      calibration.json            # cam2base (OpenCV), gt_pose (OpenGL),
                                  # focal, image_hw, embed_dim
      {d}_xarm_position.txt       # keyframe poses, mm + True/False gripper
      real{d}/pcd{k}.ply          # per-keyframe cloud, CAMERA frame + rgb
      real{d}/rgb{k}.png          # GT view (the reference's rgb{i}.png)
      real{d}/embed{k}.npy        # optional teacher features (H, W, D) f16
      real{d}/depth{k}.npy        # optional GT depth (H, W) f16

The reference captures these with a RealSense + xArm
(read_real_data_kitchen.py); here the 'sensor' is the analytic synthetic
kitchen raytraced exactly (data/synthetic.raytrace_views), so a committed
dataset with real visual structure exists without hardware. Point clouds
are stored in the OpenCV camera frame and transformed by cam2base at load
(data/replay.load_rgb_pcd), exactly like the reference's get_rgb_pcd.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from real_robot_nerf_actor_tpu.data.ply import write_ply
from real_robot_nerf_actor_tpu.data.synthetic import (
    GRIPPER_COLOR, GRIPPER_HALF, TASK_INSTRUCTIONS, _look_at,
    add_gripper_blob, make_synthetic_demo, make_synthetic_scene,
    make_task_demo, raytrace_views, teacher_embed)

GL2CV = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float64)


def write_kitchen_demos(out: str, n_demos: int = 5, n_keyframes: int = 5,
                        image_hw: Tuple[int, int] = (60, 80),
                        focal: float = 76.18, seed: int = 0,
                        d_embed: int = 512, write_embeds: bool = True,
                        write_depth: bool = True, n_points: int = 60000,
                        camera_eye: Optional[Tuple[float, float, float]] = None,
                        n_train_views: int = 1,
                        task: Optional[int] = None,
                        scene_seed: Optional[int] = None) -> dict:
    """Write a kitchen of `n_demos` demos in the reference data layout.

    image_hw/focal default to the reference's 80x60 @ 76.18
    (train_nerfact_multi_kitchen.py:1100, nerfact.conf). Returns the
    calibration dict.

    task (multi-task datasets): record demos of synthetic.make_task_demo
    task `task` instead of the default grasp demo. scene_seed decouples the
    SCENE (shared by every task of one kitchen) from the demo jitter seed;
    gripper-blob and home-jitter seeds are then task-independent, so the k0
    observation is bit-identical across tasks of one (kitchen, demo) and
    only the language tokens disambiguate the first transition.
    """
    h, w = image_hw
    os.makedirs(out, exist_ok=True)
    sseed = seed if scene_seed is None else scene_seed
    # brighter table than the unit-test default so renders are visibly
    # structured (the test scene's near-black table hides learning)
    scene = make_synthetic_scene(seed=sseed, n_points=n_points,
                                 table_color=(0.45, 0.32, 0.18))
    center = np.array([0.35, 0.2, 0.1], np.float64)
    # default eye: 1.45 m from the scene center — every surface lands in
    # the renderer's [z_near=1.2, z_far=4.0] band (measured 1.32-2.12) and
    # the scene fills ~30% of the 80x60 frame
    eye = (np.asarray(camera_eye, np.float64) if camera_eye is not None
           else center + np.array([0.9, -0.75, 0.85]))
    pose_gl = _look_at(eye.astype(np.float32), center.astype(np.float32))
    cam2base_cv = pose_gl.astype(np.float64) @ GL2CV
    # held-out camera: a second raytraced view NEVER used by the rendering
    # loss, for novel-view eval (the reference evaluates held-out views in
    # featurenerf/eval/eval_novel.py; its real-robot stack never does —
    # this closes that gap). Rotated ~35 deg about the scene center at the
    # same range so the working band stays inside [z_near, z_far].
    eye_h = center + np.array([-0.35, -1.05, 0.9])
    holdout_pose = _look_at(eye_h.astype(np.float32),
                            center.astype(np.float32))
    # extra TRAIN views (multi-view GT supervision; n_train_views > 1):
    # rotated about the scene center at the same range, always distinct
    # from the holdout camera. Single-GT-view training with viewdirs in
    # the MLP trunk (reference parity) collapses density along unseen
    # directions (BENCH_NOTES round 4); extra views regularize it.
    extra_eyes = [center + np.array([1.15, 0.25, 0.8]),
                  center + np.array([0.35, -1.1, 0.75]),
                  center + np.array([-0.9, -0.6, 0.95])]
    train_poses = [pose_gl] + [
        _look_at(e.astype(np.float32), center.astype(np.float32))
        for e in extra_eyes[:max(0, n_train_views - 1)]]

    calib = {
        "cam2base": cam2base_cv.tolist(),
        "gt_pose": pose_gl.astype(np.float64).tolist(),
        "holdout_pose": holdout_pose.astype(np.float64).tolist(),
        "focal": float(focal),
        "image_hw": [int(h), int(w)],
        "embed_dim": int(d_embed) if write_embeds else 0,
    }
    if n_train_views > 1:
        calib["train_poses"] = [p.astype(np.float64).tolist()
                                for p in train_poses]
    with open(os.path.join(out, "calibration.json"), "w") as f:
        json.dump(calib, f, indent=1)

    from PIL import Image
    r_inv = np.linalg.inv(cam2base_cv)
    for d in range(n_demos):
        if task is None:
            demo = make_synthetic_demo(scene, seed=seed + 7 * d + 1,
                                       n_keyframes=n_keyframes)
        else:
            demo = make_task_demo(scene, task, seed=seed + 7 * d + 1,
                                  home_seed=sseed * 31 + d)
        _write_xarm_position_file(
            os.path.join(out, f"{d}_xarm_position.txt"), demo)
        ddir = os.path.join(out, f"real{d}")
        os.makedirs(ddir, exist_ok=True)
        for k in range(demo.num_keyframes):
            # blob seed is task-independent (sseed-based) so the shared
            # home keyframe's cloud matches bit-exactly across tasks
            pts, cols = add_gripper_blob(scene, demo.xyz[k],
                                         seed=sseed * 17 + 100 * d + k)
            # store the cloud in the OpenCV camera frame (what a RealSense
            # export holds); load_rgb_pcd transforms it back via cam2base
            p_cam = pts @ r_inv[:3, :3].T.astype(np.float32) \
                + r_inv[:3, 3].astype(np.float32)
            write_ply(os.path.join(ddir, f"pcd{k}.ply"), p_cam,
                      (cols + 1.0) / 2.0)
            gripper = (demo.xyz[k][None], GRIPPER_HALF[None],
                       GRIPPER_COLOR[None])
            for v, pose_v in enumerate(train_poses[:max(1, n_train_views)]):
                sfx = "" if v == 0 else f"_v{v}"
                rgb, depth, xyz, mask = raytrace_views(
                    scene, pose_v[None], h, w, focal, extra_boxes=gripper)
                Image.fromarray(
                    np.clip(rgb[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
                ).save(os.path.join(ddir, f"rgb{k}{sfx}.png"))
                if write_depth:
                    np.save(os.path.join(ddir, f"depth{k}{sfx}.npy"),
                            depth[0].astype(np.float16))
                if write_embeds:
                    emb = teacher_embed(xyz[0], rgb[0], mask[0], d_embed)
                    np.save(os.path.join(ddir, f"embed{k}{sfx}.npy"),
                            emb.astype(np.float16))
            rgb_h, _, _, _ = raytrace_views(
                scene, holdout_pose[None], h, w, focal, extra_boxes=gripper)
            Image.fromarray(
                np.clip(rgb_h[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            ).save(os.path.join(ddir, f"holdout{k}.png"))
    return calib


def encode_task_instructions(instructions, seed: int = 0) -> np.ndarray:
    """Per-task CLIP text token embeddings (T, 77, 512).

    The reference encodes each task's instruction once with the CLIP RN50
    text tower and treats the result as a per-task constant
    (train_peract_single_kitchen_single_task.py:361-373, used :790-795).
    Here the in-repo tower (models/clip_text.py) runs with deterministic
    random-init weights — no pretrained checkpoint exists in this sandbox;
    distinct instructions still map to stable, well-separated token
    embeddings, which is all the policy's lang cross-attention consumes.
    """
    import jax
    import jax.numpy as jnp

    from real_robot_nerf_actor_tpu.models.clip_text import (
        ClipTextEncoder, tokenize)

    tokens = jnp.asarray(tokenize(list(instructions)))
    enc = ClipTextEncoder()
    variables = enc.init(jax.random.key(seed), tokens[:1])
    _, per_token = enc.apply(variables, tokens)
    return np.asarray(per_token, np.float32)


def write_multi_kitchen_dataset(out: str, n_kitchens: int = 2,
                                n_tasks: int = 3, n_demos: int = 4,
                                seed: int = 0, **kitchen_kwargs) -> dict:
    """The reference's namesake flagship dataset: n_kitchens scenes x
    n_tasks language-conditioned tasks x n_demos demos
    (train_nerfact_multi_kitchen.py:1080-1260 trains 2 kitchens x 3 tasks
    x 5 demos).

    Layout: out/k{i}_t{j}/ — each a standard reference-layout recording
    (one per kitchen-task pair; kitchens differ in scene AND camera) —
    plus out/manifest.json naming every entry and out/lang_embs.npz with
    the per-task CLIP token embeddings. Returns the manifest dict.
    """
    assert n_tasks <= len(TASK_INSTRUCTIONS), (
        f"only {len(TASK_INSTRUCTIONS)} task scripts defined")
    os.makedirs(out, exist_ok=True)
    center = np.array([0.35, 0.2, 0.1], np.float64)
    # per-kitchen camera: same range, rotated about the scene center
    eyes = [center + np.array([0.9, -0.75, 0.85]),
            center + np.array([-0.55, -0.95, 0.9]),
            center + np.array([1.1, 0.35, 0.8]),
            center + np.array([0.2, 1.15, 0.95])]
    entries = []
    for ki in range(n_kitchens):
        sseed = seed + 101 * ki
        for ti in range(n_tasks):
            sub = f"k{ki}_t{ti}"
            write_kitchen_demos(
                os.path.join(out, sub), n_demos=n_demos,
                seed=seed + 1000 * ki + 100 * ti, task=ti, scene_seed=sseed,
                camera_eye=tuple(eyes[ki % len(eyes)]), **kitchen_kwargs)
            entries.append({"dir": sub, "kitchen": ki, "task": ti,
                            "n_demos": n_demos,
                            "instruction": TASK_INSTRUCTIONS[ti]})
    lang = encode_task_instructions(TASK_INSTRUCTIONS[:n_tasks], seed=seed)
    np.savez(os.path.join(out, "lang_embs.npz"), embs=lang,
             instructions=np.array(TASK_INSTRUCTIONS[:n_tasks]))
    manifest = {"n_kitchens": n_kitchens, "n_tasks": n_tasks,
                "n_demos": n_demos,
                "instructions": list(TASK_INSTRUCTIONS[:n_tasks]),
                "entries": entries}
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _write_xarm_position_file(path: str, demo) -> None:
    """Inverse of data/keyframes.parse_xarm_position_file: bracketed CSV,
    positions in mm, True/False gripper flag (the reference's dump format,
    train_peract_single_kitchen_single_task.py:734-758)."""
    with open(path, "w") as f:
        for k in range(demo.num_keyframes):
            x, y, z = (demo.xyz[k] * 1000.0).tolist()
            r, p, yw = demo.rotation[k].tolist()
            g = "True" if demo.gripper_open[k] > 0.5 else "False"
            f.write(f"[{x:.3f}, {y:.3f}, {z:.3f}, {r:.3f}, {p:.3f}, "
                    f"{yw:.3f}, {g}]\n")
