#!/usr/bin/env python
"""Novel-view + distilled-feature evaluation for FeatureNeRF.

Reference behavior: featurenerf/eval/eval_novel.py renders held-out views
and reports PSNR/SSIM; the correspondence/ tools match pixels across views
by nearest-neighbor feature distance. Both are combined here: novel-view
PSNR/SSIM on the val split, plus a feature-correspondence score — pixels
of one held-out view are matched into a second view by nearest rendered
embedding and scored against geometric ground truth (depth unprojection ->
reprojection, the raycaster's own conventions from envs/rendering.py).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True, help="scene npz dir")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--n-scenes", type=int, default=3)
    ap.add_argument("--n-corr", type=int, default=200,
                    help="correspondence queries per scene (0 = off)")
    ap.add_argument("--corr-radius", type=float, default=2.0)
    ap.add_argument("--out", default=None, help="save render panels here")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from real_robot_nerf_actor_tpu.data.scene_dataset import SceneDataset
    from real_robot_nerf_actor_tpu.eval.metrics import psnr_np, ssim_np
    from real_robot_nerf_actor_tpu.ops import gen_rays
    from real_robot_nerf_actor_tpu.train.featurenerf import (
        FeatureNerfConfig, FeatureNerfTrainer)
    from real_robot_nerf_actor_tpu.train.trainer import CheckpointManager
    from real_robot_nerf_actor_tpu.utils.config import load_config

    scenes = SceneDataset(args.data_root, split="val")
    sc0 = scenes[0]
    h, w = sc0.images.shape[1:3]
    cfg = load_config(FeatureNerfConfig, args.config, args.override)
    tr = FeatureNerfTrainer(cfg)
    state = tr.init_state(jax.random.key(0), image_shape=(h, w))
    step = 0
    if args.ckpt_dir:
        restored = CheckpointManager(args.ckpt_dir).restore(state, params_only=True)
        if restored is not None:
            state = restored
            step = int(state.step)
            print(f"restored step {step}")

    variables = {"params": state.params, **state.extra}

    def encode(sc, src):
        latent = tr.net.apply(variables,
                              jnp.asarray(sc.images[src] * 2 - 1)[None],
                              method=tr.net.encode)
        w2c = jnp.linalg.inv(jnp.asarray(sc.poses[src]))[None]
        focal2 = jnp.asarray([sc.focal, -sc.focal])
        return (latent, w2c, focal2, jnp.zeros(2), (h, w))

    def render_view(sc, enc, view, key, tile=2048):
        rays = gen_rays(jnp.asarray(sc.poses[view])[None], w, h,
                        jnp.asarray(sc.focal), cfg.z_near,
                        cfg.z_far).reshape(-1, 8)
        rgb, emb = [], []
        for s in range(0, rays.shape[0], tile):
            out = tr.renderer.render_rays(variables, enc, rays[s:s + tile],
                                          key)
            f = out.get("fine", out["coarse"])
            rgb.append(np.asarray(f.rgb))
            emb.append(np.asarray(f.embed))
        return (np.concatenate(rgb).reshape(h, w, 3),
                np.concatenate(emb).reshape(h, w, -1))

    results = {"step": step, "scenes": []}
    psnrs, ssims, corr_accs, corr_chance = [], [], [], []
    rng = np.random.default_rng(0)
    for si in range(min(args.n_scenes, len(scenes))):
        sc = scenes[si]
        nv = len(sc.images)
        src, tgt, tgt2 = 0, nv // 2, (nv // 2 + 3) % nv
        enc = encode(sc, src)
        pred, emb_a = render_view(sc, enc, tgt, jax.random.key(si))
        gt = sc.images[tgt]
        p, s_ = psnr_np(pred, gt), ssim_np(pred.mean(-1), gt.mean(-1))
        psnrs.append(p)
        ssims.append(s_)
        entry = {"psnr": p, "ssim": s_}
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            from real_robot_nerf_actor_tpu.utils.visualize import (
                save_render_panel)
            save_render_panel(os.path.join(args.out, f"novel_{si}.png"),
                              gt, pred, psnr=p)

        if args.n_corr > 0 and sc.depth is not None:
            # geometric GT matches via the raycaster's conventions
            # (envs/rendering.py:99-113: z-depth, K with c=(n-1)/2)
            _, emb_b = render_view(sc, enc, tgt2, jax.random.key(100 + si))
            cx, cy, f = (w - 1) / 2.0, (h - 1) / 2.0, sc.focal
            dA, dB = sc.depth[tgt], sc.depth[tgt2]
            ys, xs = np.nonzero(np.isfinite(dA))
            take = rng.choice(len(ys), size=min(args.n_corr, len(ys)),
                              replace=False)
            ys, xs = ys[take], xs[take]
            dirs = np.stack([(xs - cx) / f, -(ys - cy) / f,
                             -np.ones_like(xs, np.float64)], -1)
            t = dA[ys, xs] / (-dirs[:, 2])
            pts = (dirs * t[:, None]) @ sc.poses[tgt][:3, :3].T \
                + sc.poses[tgt][:3, 3]
            pc = (pts - sc.poses[tgt2][:3, 3]) @ sc.poses[tgt2][:3, :3]
            zb = -pc[:, 2]
            xb = pc[:, 0] / zb * f + cx
            yb = -pc[:, 1] / zb * f + cy
            xi, yi = np.round(xb).astype(int), np.round(yb).astype(int)
            inb = (zb > 0) & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            # occlusion check: reprojected depth must match view B's depth
            vis = inb.copy()
            vis[inb] &= np.abs(dB[yi[inb], xi[inb]] - zb[inb]) \
                < 0.02 * zb[inb]
            if vis.sum() >= 10:
                qa = emb_a[ys[vis], xs[vis]]              # (Q, D)
                eb = emb_b.reshape(-1, emb_b.shape[-1])   # (HW, D)
                qa_n = qa / (np.linalg.norm(qa, axis=-1, keepdims=True)
                             + 1e-8)
                eb_n = eb / (np.linalg.norm(eb, axis=-1, keepdims=True)
                             + 1e-8)
                nn = np.argmax(qa_n @ eb_n.T, axis=-1)
                ny, nx = nn // w, nn % w
                derr = np.hypot(ny - yb[vis], nx - xb[vis])
                acc = float((derr <= args.corr_radius).mean())
                chance = (np.pi * args.corr_radius ** 2) / (h * w)
                corr_accs.append(acc)
                corr_chance.append(chance)
                entry.update(corr_acc=acc, corr_queries=int(vis.sum()),
                             corr_chance=chance,
                             corr_px_err_median=float(np.median(derr)))
        results["scenes"].append(entry)
        print(f"scene {si}: {entry}")

    results.update(psnr_mean=float(np.mean(psnrs)),
                   psnr_std=float(np.std(psnrs)),
                   ssim_mean=float(np.mean(ssims)))
    if corr_accs:
        results.update(corr_acc_mean=float(np.mean(corr_accs)),
                       corr_chance=float(np.mean(corr_chance)))
    print(f"novel-view PSNR: {results['psnr_mean']:.2f} +- "
          f"{results['psnr_std']:.2f}  SSIM: {results['ssim_mean']:.3f}"
          + (f"  corr@{args.corr_radius}px: {results['corr_acc_mean']:.3f}"
             f" (chance {results['corr_chance']:.4f})" if corr_accs else ""))
    if args.out_json:
        os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
        with open(args.out_json, "w") as fjs:
            json.dump(results, fjs, indent=1)


if __name__ == "__main__":
    main()
