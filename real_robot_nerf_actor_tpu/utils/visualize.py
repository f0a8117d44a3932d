"""Voxel-grid / action visualization (matplotlib, headless).

Reference behavior: /root/reference/utils.py:167-246 (visualise_voxel via
trimesh+pyrender offscreen) and vis_real_voxel.py: render the occupancy
voxel grid with the GT/predicted action highlighted. Rebuilt on matplotlib
3-D scatter (no GL), writing PNG files — the reference's visual-check
artifacts (SURVEY.md §4).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def visualize_voxel_grid(voxel_grid: np.ndarray,
                         gt_action: Optional[np.ndarray] = None,
                         pred_action: Optional[np.ndarray] = None,
                         save_path: Optional[str] = None,
                         max_points: int = 20000):
    """voxel_grid: (V, V, V, C) channel-last with occupancy last and rgb in
    channels 3:6 (the voxelizer layout). Actions are (3,) voxel indices.
    Returns the matplotlib figure (also saved when save_path given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    occ = voxel_grid[..., -1] > 0.5
    idx = np.argwhere(occ)
    if idx.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(idx.shape[0], max_points,
                                              replace=False)
        idx = idx[sel]
    rgb = voxel_grid[idx[:, 0], idx[:, 1], idx[:, 2], 3:6]
    rgb = np.clip((rgb + 1.0) / 2.0, 0, 1)  # undo [-1,1] normalization

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(idx[:, 0], idx[:, 1], idx[:, 2], c=rgb, s=2, alpha=0.6)
    if gt_action is not None:
        ax.scatter(*np.asarray(gt_action), c="lime", s=220, marker="*",
                   label="gt")
    if pred_action is not None:
        ax.scatter(*np.asarray(pred_action), c="red", s=220, marker="x",
                   label="pred")
    v = voxel_grid.shape[0]
    ax.set_xlim(0, v); ax.set_ylim(0, v); ax.set_zlim(0, v)
    if gt_action is not None or pred_action is not None:
        ax.legend()
    if save_path:
        fig.savefig(save_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
    return fig


def save_render_panel(save_path: str, gt_rgb: np.ndarray, rgb: np.ndarray,
                      depth: Optional[np.ndarray] = None,
                      embed: Optional[np.ndarray] = None,
                      psnr: Optional[float] = None):
    """Side-by-side GT / render / depth / embed panel — the reference's
    periodic visual check (train_nerfact_multi_kitchen.py:1416-1437,
    train_embed.py vis_step)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = [("gt", gt_rgb), ("render", np.clip(rgb, 0, 1))]
    if depth is not None:
        d = np.asarray(depth)
        finite = np.isfinite(d)
        dn = np.zeros_like(d)
        if finite.any():
            lo, hi = d[finite].min(), d[finite].max()
            dn = np.where(finite, (d - lo) / max(hi - lo, 1e-6), 1.0)
        panels.append(("depth", dn))
    if embed is not None:
        e = np.asarray(embed)
        e3 = e[..., :3] if e.shape[-1] >= 3 else np.repeat(e, 3, -1)[..., :3]
        e3 = (e3 - e3.min()) / max(e3.max() - e3.min(), 1e-6)
        panels.append(("embed", e3))

    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 4))
    if len(panels) == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, panels):
        ax.imshow(img, cmap="viridis" if img.ndim == 2 else None)
        ax.set_title(name)
        ax.axis("off")
    if psnr is not None:
        fig.suptitle(f"PSNR {psnr:.2f}")
    fig.savefig(save_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
