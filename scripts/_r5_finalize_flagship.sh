#!/bin/bash
# Round-5 flagship (reference-scale bs=1/accum=1 multitask run) evidence
# collection. Run on the real TPU AFTER training completes (or after
# stopping it at the composite-best checkpoint):
#   bash scripts/_r5_finalize_flagship.sh [artifacts/round5_flagship]
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=${1:-artifacts/round5_flagship}
DATA=datasets/multikitchen_r5b

# 1. quality.json from the in-loop eval stream (per-task decode, zero-lang
#    ablation, composite-best row)
python scripts/_r5_collect_multitask.py \
    --run-log "$ROOT/run.log" \
    --best "$ROOT/ckpt_best/best.json" \
    --out "$ROOT/quality.json"

# 2. serving-backend quality gate + BC decode on the trained checkpoint
#    (task 0; the serving gate is per-scene, task identity only moves the
#    decode rows). --n-perturb gives the SE(3)-robustness row.
python scripts/eval_quality.py --config configs/nerfact.yaml \
    --ckpt-dir "$ROOT/ckpt_best" \
    --data-root "$DATA/k0_t0" \
    --lang-npz "$DATA/lang_embs.npz" --task-index 0 \
    --holdout-demos 3 --n-perturb 3 \
    -o renderer.image_width=80 -o renderer.image_height=60 \
    -o peract.voxelizer.max_num_coords=65536 \
    -o peract.model.aux_trans_head=true \
    -o peract.model.grip_proprio_scale=25 \
    -o peract.z_loss=1e-4 \
    --out "$ROOT/quality_serving.json" \
    --panels-dir "$ROOT/renders"

echo "finalized: $ROOT/quality.json + $ROOT/quality_serving.json"
