"""Multi-kitchen multi-task dataset manifest loading.

The reference's flagship trainer walks 2 kitchens x 3 tasks x 5 demos with
per-task CLIP instruction embeddings
(/root/reference/train_nerfact_multi_kitchen.py:1080-1260, :790-795).
Datasets written by data/kitchen.write_multi_kitchen_dataset carry one
reference-layout recording per (kitchen, task) plus manifest.json and
lang_embs.npz; this module turns that into the entry list the trainers'
multi_replay_data consumes.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_multitask_entries(root: str,
                           exclude_demos: Tuple[int, ...] = (),
                           n_demos: Optional[int] = None) -> List[Dict]:
    """Entries for PerActTrainer.multi_replay_data from a multi-kitchen
    dataset root (manifest.json + lang_embs.npz + k{i}_t{j}/ dirs).

    exclude_demos applies to EVERY (kitchen, task) pair: those demo ids are
    held out of training everywhere (leave-one-demo-out across the whole
    grid). Each entry carries its kitchen/task ids and instruction so eval
    harnesses can report per-task metrics.
    """
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    lang = np.load(os.path.join(root, "lang_embs.npz"))["embs"]
    entries = []
    for e in manifest["entries"]:
        entries.append({
            "root": os.path.join(root, e["dir"]),
            "n_demos": int(n_demos if n_demos is not None else e["n_demos"]),
            "lang": lang[e["task"]].astype(np.float32),
            "exclude_demos": tuple(exclude_demos),
            "kitchen": int(e["kitchen"]),
            "task": int(e["task"]),
            "instruction": e["instruction"],
        })
    return entries
