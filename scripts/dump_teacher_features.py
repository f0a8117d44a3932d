#!/usr/bin/env python
"""Teacher-feature dumper for scene datasets.

Reference analog: featurenerf_robo/correspondence/extract_dino_feature.py —
run the DINO ViT over every view of every scene and save the dense
layer-9 key features + layer-11 cls attention next to the images
(features_real.npz). Here the features/cls_attn are written INTO each
scene npz (data/scene_dataset.py Scene fields), which is where
FeatureNerfTrainer.scene_data reads them.

Teacher provenance: this sandbox has no network egress and no pretrained
DINO checkpoint on disk, so the teacher is a seed-fixed randomly
initialized DinoViT (models/vit.py). Distillation quality metrics remain
meaningful — they measure how well the NeRF student reproduces THIS
teacher's view-dependent feature maps, which is the training objective —
but the features are not semantic DINO features. To use real weights,
convert them with models.vit.convert_torch_vit_weights and pass
--vit-ckpt.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True, help="dir of scene .npz")
    ap.add_argument("--feature-layer", type=int, default=9)
    ap.add_argument("--attn-layer", type=int, default=11)
    ap.add_argument("--pca", type=int, default=64,
                    help="PCA-reduce teacher features to this dim "
                         "(reference renderer-loss prep, "
                         "neural_rendering.py:636-646); 0 = keep full width")
    ap.add_argument("--patch", type=int, default=8)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--vit-ckpt", default=None,
                    help="npz of converted torch ViT weights (optional)")
    args = ap.parse_args()

    from real_robot_nerf_actor_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import numpy as np
    from real_robot_nerf_actor_tpu.data.scene_dataset import (load_scene,
                                                              save_scene)
    from real_robot_nerf_actor_tpu.models.vit import DinoViT, ViTConfig
    from real_robot_nerf_actor_tpu.train.distill2d import (
        extract_teacher_features)

    paths = sorted(glob.glob(os.path.join(args.data_root, "*.npz")))
    if not paths:
        raise FileNotFoundError(args.data_root)
    sc0 = load_scene(paths[0])
    h, w = sc0.images.shape[1:3]
    cfg = ViTConfig(patch_size=args.patch, embed_dim=args.embed_dim,
                    depth=args.depth, image_size=max(h, w))
    vit = DinoViT(cfg)
    if args.vit_ckpt:
        from real_robot_nerf_actor_tpu.models.vit import (
            convert_torch_vit_weights)
        variables = convert_torch_vit_weights(np.load(args.vit_ckpt))
        prov = f"converted:{args.vit_ckpt}"
    else:
        variables = vit.init(jax.random.key(args.seed),
                             sc0.images[:1])
        prov = f"random-init seed={args.seed} (no pretrained ckpt on disk)"

    for p in paths:
        sc = load_scene(p)
        feats, attn = extract_teacher_features(
            variables, sc.images, cfg, args.feature_layer, args.attn_layer,
            pca_components=args.pca or None)
        sc.features = np.asarray(feats, np.float32)
        sc.cls_attn = np.asarray(attn, np.float32)
        save_scene(p, sc)
        print(f"{os.path.basename(p)}: features {sc.features.shape} "
              f"attn {sc.cls_attn.shape}")
    print(f"teacher: ViT-{args.embed_dim}/p{args.patch} layer {args.feature_layer}"
          f" [{prov}]")


if __name__ == "__main__":
    main()
