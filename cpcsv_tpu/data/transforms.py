"""Host-side image transforms (reference main_pororo.py:71-95).

All outputs are float32 NHWC in [-1, 1] (Normalize(0.5, 0.5)); videos are
(T, H, W, C) — the TPU-native layout (the reference permutes to C,T,H,W).
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def resize_image(arr: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC (or HW) -> uint8 size x size, PIL bilinear like
    torchvision.transforms.Resize."""
    if arr.shape[0] == size and arr.shape[1] == size:
        return arr
    im = Image.fromarray(arr)
    im = im.resize((size, size), Image.BILINEAR)
    return np.asarray(im)


def normalize_image(arr: np.ndarray, size: int) -> np.ndarray:
    """uint8 HWC -> float32 (size,size,C) in [-1,1]."""
    arr = resize_image(arr, size)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.astype(np.float32) / 127.5 - 1.0


def video_transform(frames: np.ndarray, size: int) -> np.ndarray:
    """(T, H, W, C) uint8 -> (T, size, size, C) float32 in [-1,1]
    (reference datasets/utils.py:3-10, but T-major instead of C,T,H,W)."""
    return np.stack([normalize_image(f, size) for f in frames], axis=0)
