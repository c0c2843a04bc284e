"""Image/video save helpers (reference miscc/utils.py:230-311) — numpy/PIL,
no torchvision. Internal layout is NHWC / (B,T,H,W,C); converters to the
reference's (B,C,T,H,W) are provided for interop."""

from __future__ import annotations

import os

import numpy as np


def to_ncthw(video_bthwc: np.ndarray) -> np.ndarray:
    return np.transpose(video_bthwc, (0, 4, 1, 2, 3))


def from_ncthw(video_ncthw: np.ndarray) -> np.ndarray:
    return np.transpose(video_ncthw, (0, 2, 3, 4, 1))


def images_to_numpy(img: np.ndarray) -> np.ndarray:
    """[-1,1] float HWC -> uint8 (reference miscc/utils.py:230-235)."""
    img = np.clip(img, -1, 1)
    return ((img + 1) / 2 * 255).astype("uint8")


def make_grid(images: np.ndarray, ncol: int, pad: int = 2) -> np.ndarray:
    """(N,H,W,C) float [-1,1] -> grid (H',W',C) float [-1,1]
    (equivalent of torchvision.utils.make_grid with padding=2, pad_value=0:
    the reference grids separators render MID-GRAY after the [-1,1]->[0,255]
    mapping, since vutils.make_grid pads BEFORE images_to_numpy)."""
    n, h, w, c = images.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.full(
        (nrow * (h + pad) + pad, ncol * (w + pad) + pad, c), 0.0, images.dtype
    )
    for i in range(n):
        r, cl = divmod(i, ncol)
        y, x = pad + r * (h + pad), pad + cl * (w + pad)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_story_results(
    ground_truth: np.ndarray | None,
    videos: np.ndarray,
    texts,
    name,
    image_dir: str,
    step: int = 0,
) -> np.ndarray:
    """Epoch sample grid (reference save_story_results, miscc/utils.py:237-280).
    videos: (B,T,H,W,C) in [-1,1]. Returns uint8 grid image (also used for
    tensorboard)."""
    T = videos.shape[1]
    rows = [make_grid(videos[i], T) for i in range(videos.shape[0])]
    all_images = make_grid(np.stack(rows), 1)
    all_images = images_to_numpy(all_images)
    if ground_truth is not None:
        rows = [make_grid(ground_truth[i], T) for i in range(ground_truth.shape[0])]
        gts = images_to_numpy(make_grid(np.stack(rows), 1))
        all_images = np.concatenate([all_images, gts], axis=1)
    if texts is not None:
        # texts: list over batch of (list over frames of str) or plain strings
        with open(os.path.join(image_dir, f"fake_samples_{name}.txt"), "w") as fid:
            for idx in range(min(videos.shape[0], len(texts))):
                fid.write(f"{idx} {'-' * 40}\n")
                item = texts[idx]
                if isinstance(item, (list, tuple)):
                    for line in item:
                        fid.write(str(line) + "\n")
                else:
                    fid.write(str(item) + "\n")
                fid.write("\n\n")
    return all_images


def save_image_results(ground_truth: np.ndarray | None, images: np.ndarray, video_len: int = 5) -> np.ndarray:
    """Segment grid (reference save_image_results, miscc/utils.py:282-301).
    images: (B*T,H,W,C) in [-1,1]."""
    n = images.shape[0] // video_len
    imgs = images.reshape(n, video_len, *images.shape[1:])
    rows = [make_grid(imgs[i], video_len) for i in range(n)]
    all_images = images_to_numpy(make_grid(np.stack(rows), 1))
    if ground_truth is not None:
        gt = ground_truth.reshape(n, video_len, *ground_truth.shape[1:])
        rows = [make_grid(gt[i], video_len) for i in range(n)]
        gts = images_to_numpy(make_grid(np.stack(rows), 1))
        all_images = np.concatenate([all_images, gts], axis=1)
    return all_images


def save_png(img_float_hwc: np.ndarray, path: str):
    from PIL import Image

    arr = images_to_numpy(img_float_hwc)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    Image.fromarray(arr).save(path)


def save_all_img(videos: np.ndarray, count: int, image_dir: str) -> int:
    """Dump every frame as {count}.png (reference save_all_img,
    miscc/utils.py:303-311 — the numbered-png protocol the FVD driver reads).
    videos: (B,T,H,W,C) in [-1,1]."""
    os.makedirs(image_dir, exist_ok=True)
    for b in range(videos.shape[0]):
        for t in range(videos.shape[1]):
            count += 1
            save_png(videos[b, t], os.path.join(image_dir, f"{count}.png"))
    return count
