#!/usr/bin/env python
"""Collect the round-5 multitask flagship's quality.json from the training
run's in-loop eval rows (train/nerfact.py make_multi_replay_eval: per-task
BC decode, zero-lang ablation, per-kitchen train/holdout renders) plus the
composite-best checkpoint record.

Usage: python scripts/_r5_collect_multitask.py \
    --run-log artifacts/round5_multitask/run.log \
    --best artifacts/round5_multitask/ckpt_best/best.json \
    --out artifacts/round5_multitask/quality.json
"""
import argparse
import json
import re


def parse_eval_rows(path):
    rows = []
    for line in open(path):
        if "[eval] step" not in line:
            continue
        m = re.search(r"\[eval\] step (\d+)", line)
        if not m:
            continue
        row = {"step": int(m.group(1))}
        for k, v in re.findall(r"(\w+)=([-\d.]+)", line):
            if k != "step":
                try:
                    row[k] = float(v)
                except ValueError:
                    pass
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-log", required=True)
    ap.add_argument("--best", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    rows = parse_eval_rows(args.run_log)
    assert rows, f"no eval rows in {args.run_log}"
    # the run may have restarted (supervise/VM): steps can repeat — keep
    # the LAST occurrence of each step (the surviving run's row)
    by_step = {}
    for r in rows:
        by_step[r["step"]] = r
    rows = [by_step[s] for s in sorted(by_step)]

    best_step = None
    if args.best:
        try:
            best_step = json.load(open(args.best)).get("step")
        except FileNotFoundError:
            pass
    best_row = by_step.get(best_step) if best_step in by_step else None
    final_row = rows[-1]
    # peak rows for context (what the run reached on each axis)
    peak_exact = max(rows, key=lambda r: r.get("bc_train_exact", 0.0))

    out = {
        "source": args.run_log,
        "n_evals": len(rows),
        "final": final_row,
        "best_ckpt_step": best_step,
        "best_ckpt_row": best_row,
        "peak_bc_train_exact_row": peak_exact,
        "zero_lang_ablation": {
            "bc_train_exact": (best_row or final_row).get("bc_train_exact"),
            "bc_zerolang_exact": (best_row or final_row).get(
                "bc_zerolang_exact"),
            "bc_train_dist": (best_row or final_row).get("bc_train_dist"),
            "bc_zerolang_dist": (best_row or final_row).get(
                "bc_zerolang_dist"),
            "note": "same transitions decoded with the task's CLIP lang "
                    "tokens vs lang=zeros; a gap means the lang "
                    "cross-attention pathway carries task identity",
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("n_evals", "best_ckpt_step")}))
    fr = best_row or final_row
    for k in sorted(fr):
        if k.startswith("bc_") or k.startswith("eval_"):
            print(f"  {k} = {fr[k]}")


if __name__ == "__main__":
    main()
