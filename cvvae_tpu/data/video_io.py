"""Video read/write on the host (OpenCV backend).

Replaces the reference's decord reader + torchvision writer
(cvvae_inference_video.py:20-52) with cv2, which is what this image
ships.  Values follow the reference contracts: frames are RGB uint8 on
read; ``normalize`` maps to [-1, 1] via x/127.5 - 1
(cvvae_inference_video.py:34).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def read_video(path: str, *, height: Optional[int] = None,
               width: Optional[int] = None,
               max_frames: Optional[int] = None) -> Tuple[np.ndarray, float]:
    """Read an mp4 -> (frames (T,H,W,3) RGB uint8, fps)."""
    if not _HAS_CV2:
        raise ImportError("cv2 is required for video IO")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if height is not None and width is not None:
            frame = cv2.resize(frame, (width, height),
                               interpolation=cv2.INTER_LINEAR)
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), float(fps)


def write_video(path: str, frames: np.ndarray, fps: float = 30.0) -> None:
    """Write (T,H,W,3) RGB uint8 frames to an mp4."""
    if not _HAS_CV2:
        raise ImportError("cv2 is required for video IO")
    t, h, w, _ = frames.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    out = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not out.isOpened():
        raise IOError(f"cannot open video writer for {path}")
    for i in range(t):
        out.write(cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
    out.release()


def truncate_to_4k1(num_frames: int) -> int:
    """The input frame contract T -> 4k+1 (cvvae_inference_video.py:32)."""
    return 1 + (num_frames - 1) // 4 * 4


def normalize(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB -> float32 in [-1, 1] (cvvae_inference_video.py:34)."""
    return frames.astype(np.float32) / 127.5 - 1.0


def denormalize(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 RGB (cvvae_inference_video.py:49-51)."""
    return np.clip((frames + 1.0) * 127.5, 0, 255).astype(np.uint8)
