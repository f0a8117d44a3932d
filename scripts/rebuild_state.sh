#!/bin/bash
# Regenerate every gitignored on-disk artifact this repo's committed runs
# depend on. All generators are seed-deterministic, so the rebuilt datasets
# are bit-identical to the ones the committed logs/artifacts were produced
# from. Run from the repo root. (Written after a sandbox reprovision wiped
# datasets/, artifacts/*/ckpt/ and the JAX compile caches mid-round-5.)
#
# CPU is enough (and required on a box whose TPU tunnel is down):
# every generator below runs the raytracer / CLIP tower on host.
set -euo pipefail
cd "$(dirname "$0")/.."

CPU_ENV=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu)

# 1. Single-kitchen recorded demos (round-3/4 flagship + eval_quality):
#    6 demos, multi-view GT (2 extra train cameras), reference layout.
[ -d datasets/kitchen_r4 ] || "${CPU_ENV[@]}" python scripts/gen_data.py \
    kitchen --out datasets/kitchen_r4 --n 6 --train-views 2
[ -d datasets/kitchen_r3 ] || "${CPU_ENV[@]}" python scripts/gen_data.py \
    kitchen --out datasets/kitchen_r3 --n 5

# 2. Multi-kitchen x multi-task grid (round-5 flagship; the reference's
#    namesake workload: 2 kitchens x 3 language-conditioned tasks x 5 demos
#    + manifest + per-task CLIP lang embeddings).
[ -d datasets/multikitchen_r5 ] || "${CPU_ENV[@]}" python scripts/gen_data.py \
    multikitchen --out datasets/multikitchen_r5 --kitchens 2 --tasks 3 --n 5
#    r5b: same seeds, press-task state-aliasing fix (synthetic.py lift
#    +0.25) — the fine-tune flagship trains on this one. NOTE: r5 above
#    regenerated from the fixed code will carry the fixed t2 too; r5's
#    committed logs predate the fix (t0/t1 are bit-identical either way).
[ -d datasets/multikitchen_r5b ] || "${CPU_ENV[@]}" python scripts/gen_data.py \
    multikitchen --out datasets/multikitchen_r5b --kitchens 2 --tasks 3 --n 5

# 3. Orbit NeRF scenes with depth (FeatureNeRF pretraining + teacher):
#    10 scenes x 12 views raytraced RGB-D of the lift scene.
[ -d datasets/nerf_lift_r4 ] || "${CPU_ENV[@]}" python scripts/gen_data.py \
    nerf --out datasets/nerf_lift_r4 --task lift --n 10

# 4. Teacher features for FeatureNeRF distillation (round 5: in-repo
#    geometry-contrastive teacher; writes features+saliency INTO the scene
#    npz). Run on TPU if available (minutes), CPU otherwise (slower).
#    python scripts/train_teacher.py --data-root datasets/nerf_lift_r4 \
#        --steps 3000 --out artifacts/round5_featurenerf/teacher.msgpack \
#        --dump --quality-out artifacts/round5_featurenerf/teacher_quality.json

echo "datasets rebuilt. Compile caches (.jax_cache/, .jax_cache_cpu/) refill"
echo "on first run; checkpoints under artifacts/*/ckpt are training outputs"
echo "and are rebuilt by re-running the commands at the top of each"
echo "artifacts/*/run.log (all drivers resume from the latest checkpoint)."
