"""Host-side video/image writing.

The reference shells out to ffmpeg/libx264 through ``imutil``
(reference README.md:20; e.g. main.py:350,601-603).  Video encoding stays
on the host here too, out of every compiled path.  Backend order:
  1. imageio mp4 (when an ffmpeg backend is importable)
  2. native uncompressed-AVI writer (scmgan_tpu.native.aviwriter, C++)
  3. imageio GIF
  4. per-frame PNGs
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8(frame: np.ndarray) -> np.ndarray:
    """float [0,1] (H, W, C) or (H, W) -> uint8 RGB."""
    frame = np.asarray(frame)
    if frame.ndim == 2:
        frame = frame[:, :, None]
    if frame.shape[-1] == 1:
        frame = np.repeat(frame, 3, axis=-1)
    if frame.shape[-1] > 3:
        frame = frame[:, :, :3]
    frame = np.clip(frame, 0.0, 1.0)
    return (frame * 255).astype(np.uint8)


def resize_nearest(frame: np.ndarray, size: tuple) -> np.ndarray:
    """Nearest-neighbor resize without external deps."""
    h, w = frame.shape[:2]
    th, tw = size
    rows = (np.arange(th) * h // th).clip(0, h - 1)
    cols = (np.arange(tw) * w // tw).clip(0, w - 1)
    return frame[rows][:, cols]


class Video:
    """Minimal drop-in for imutil.Video: ``write_frame`` + ``finish``."""

    def __init__(self, filename: str, framerate: int = 10):
        self.filename = filename
        self.framerate = framerate
        self.frames = []

    def write_frame(self, frame, resize_to: Optional[tuple] = None,
                    caption: str = "", **_):
        img = to_uint8(frame)
        if resize_to is not None:
            img = resize_nearest(img, resize_to)
        self.frames.append(img)

    def finish(self) -> str:
        """Encode and write; returns the path actually written."""
        if not self.frames:
            return self.filename
        frames = self.frames
        base, ext = os.path.splitext(self.filename)
        # 1. mp4 via imageio+ffmpeg
        try:
            import imageio

            with imageio.get_writer(base + ".mp4", fps=self.framerate) as w:
                for f in frames:
                    w.append_data(f)
            return base + ".mp4"
        except Exception:
            pass
        # 2. native AVI writer
        try:
            from scmgan_tpu.native import aviwriter

            path = base + ".avi"
            aviwriter.write_avi(path, np.stack(frames), self.framerate)
            return path
        except Exception:
            pass
        # 3. GIF
        try:
            import imageio

            path = base + ".gif"
            imageio.mimsave(path, frames, duration=1.0 / self.framerate)
            return path
        except Exception:
            pass
        # 4. PNG frames
        os.makedirs(base + "_frames", exist_ok=True)
        try:
            from PIL import Image

            for i, f in enumerate(frames):
                Image.fromarray(f).save(
                    os.path.join(base + "_frames", f"{i:05d}.png"))
        except Exception:
            np.savez_compressed(base + "_frames.npz", frames=np.stack(frames))
        return base + "_frames"


def save_image(pixels, filename: str, resize_to: Optional[tuple] = None):
    img = to_uint8(np.asarray(pixels, dtype=np.float64)
                   / max(float(np.max(pixels)), 1e-8))
    if resize_to is not None:
        img = resize_nearest(img, resize_to)
    from PIL import Image

    Image.fromarray(img).save(filename)
    return filename
