"""Episode video recording (reference src/video.py VideoRecorder).

Frames are collected as numpy RGB and written as an animated GIF via PIL
(no ffmpeg dependency); `save_frames_npz` keeps the raw array for
programmatic use.
"""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


class VideoRecorder:
    def __init__(self, save_dir: Optional[str], fps: int = 15,
                 enabled: bool = True):
        self.save_dir = save_dir
        self.fps = fps
        self.enabled = enabled and save_dir is not None
        self.frames: List[np.ndarray] = []
        if self.enabled:
            os.makedirs(save_dir, exist_ok=True)

    def init(self, env=None):
        self.frames = []
        if env is not None:
            self.record(env)

    def record(self, env):
        if not self.enabled:
            return
        frame = env.render()
        if frame is not None:
            self.frames.append(np.asarray(frame))

    def record_frame(self, frame: np.ndarray):
        if self.enabled:
            self.frames.append(np.asarray(frame))

    def save(self, name: str) -> Optional[str]:
        if not self.enabled or not self.frames:
            return None
        path = os.path.join(self.save_dir, name if name.endswith(".gif")
                            else name + ".gif")
        from PIL import Image
        imgs = []
        for f in self.frames:
            if f.dtype != np.uint8:
                f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            imgs.append(Image.fromarray(f))
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / self.fps), loop=0)
        return path

    def save_frames_npz(self, name: str) -> Optional[str]:
        if not self.enabled or not self.frames:
            return None
        path = os.path.join(self.save_dir, name + ".npz")
        np.savez_compressed(path, frames=np.stack(self.frames))
        return path
