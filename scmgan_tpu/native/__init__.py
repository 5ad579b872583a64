"""Native (C) runtime components, loaded via ctypes.

Build model: the shared library compiles lazily on first import with the
system compiler (cc/g++ are baked into the image) and is cached next to the
sources; `make -C scmgan_tpu/native` builds it explicitly.

Components:
  * avi_writer — uncompressed-AVI video encoder (the native stand-in for
    the reference's ffmpeg/libx264 dependency, reference README.md:20).
  * stitcher   — replay-buffer trajectory clip stitching (the host data-
    loader hot loop, reference envs/minipacman.py:139-164).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src")
_LIB_PATH = os.path.join(_DIR, "libscmgan_native.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    sources = [os.path.join(_SRC, f)
               for f in ("avi_writer.c", "stitcher.c")]
    newest_src = max(os.path.getmtime(s) for s in sources)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < newest_src):
        cmd = ["cc", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, *sources]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.write_avi.restype = ctypes.c_int
            lib.write_avi.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.stitch.restype = None
            lib.stitch.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_ubyte),
            ]
            _lib = lib
    return _lib


class _AviWriterModule:
    """Namespace matching scmgan_tpu.analysis.video's fallback import."""

    @staticmethod
    def write_avi(path: str, frames: np.ndarray, fps: int = 10):
        """frames: (N, H, W, 3) uint8 RGB."""
        frames = np.ascontiguousarray(frames, dtype=np.uint8)
        n, h, w, c = frames.shape
        assert c == 3, "write_avi expects RGB frames"
        lib = _load()
        rc = lib.write_avi(
            path.encode(), frames.ctypes.data_as(ctypes.c_char_p),
            n, h, w, int(fps))
        if rc != 0:
            raise OSError(f"write_avi failed with code {rc}")
        return path


aviwriter = _AviWriterModule()


def stitch_batch(frames: np.ndarray, rewards: np.ndarray,
                 actions: np.ndarray, ep_offsets: np.ndarray,
                 ep_lengths: np.ndarray, batch: int, timesteps: int,
                 random_start: bool = True, seed: int = 1):
    """C-accelerated clip stitching over contiguous episode arenas.

    frames: (total_steps, *frame_shape) f32; rewards: (total_steps, R) f32;
    actions: (total_steps,) i32; ep_offsets/ep_lengths: per-episode step
    offset/length into the arenas.
    Returns (frames (B,T,...), rewards (B,T,R), dones (B,T) bool,
    actions (B,T)).
    """
    if len(ep_lengths) == 0:
        raise ValueError("stitch_batch needs at least one episode")
    lib = _load()
    frames = np.ascontiguousarray(frames, np.float32)
    rewards = np.ascontiguousarray(rewards, np.float32)
    actions = np.ascontiguousarray(actions, np.int32)
    ep_offsets = np.ascontiguousarray(ep_offsets, np.int64)
    ep_lengths = np.ascontiguousarray(ep_lengths, np.int32)
    frame_shape = frames.shape[1:]
    frame_elems = int(np.prod(frame_shape))
    reward_elems = rewards.shape[1]

    out_f = np.empty((batch, timesteps, *frame_shape), np.float32)
    out_r = np.empty((batch, timesteps, reward_elems), np.float32)
    out_a = np.empty((batch, timesteps), np.int32)
    out_d = np.empty((batch, timesteps), np.uint8)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    lib.stitch(
        fp(frames), fp(rewards), ip(actions),
        ep_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ip(ep_lengths), len(ep_lengths), frame_elems, reward_elems,
        batch, timesteps, int(random_start), seed,
        fp(out_f), fp(out_r), ip(out_a),
        out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out_f, out_r, out_d.astype(bool), out_a
