"""Procedural Pororo-protocol dataset with genuine visual structure.

Purpose (VERDICT r4 item 3): the machine has no real Pororo data, so every
training demonstration so far ran on unstructured synthetic noise — which can
prove loss health but never that the ADVERSARIAL loop learns a label→image
mapping. This module writes a deterministic on-disk dataset in the exact
artifact protocol of `data/pororo.py` (reference `datasets/pororo.py`):
episode dirs of frame pngs, labels.npy, frames_counter.npy,
descriptions{_vec,_attr,}.npy, subtitles_vec.npy, train_test_ids.npy and
img_segment/ masks — so the unmodified Pororo pipeline (clip index cache,
StoryDataset/ImageDataset, the full cascade trainer and every eval walk)
runs on it unchanged.

The visual world: 9 "characters" (distinct color×shape combos — the
LABEL_NUM=9 slot structure of Pororo). Each episode casts 1-3 of them;
each cast member follows a smooth per-episode trajectory with per-episode
size and brightness, over a per-episode dark background. So:

  * labels      (9-dim multi-hot)  -> WHICH shapes appear,
  * description (128-d, slotted)   -> which + where + size + brightness,
  * attributes  (228-d, slotted)   -> size + brightness,
  * consecutive frames             -> coherent motion (the story/video
                                      discriminators see real temporal
                                      structure, not iid noise),
  * img_segment masks              -> exact figure-ground (union of shapes),

all of which a conditional GAN can genuinely learn, and a human can verify
from a sample grid at a glance (right count of blobs, right colors, dark
background). Everything derives from numpy SeedSequence streams keyed on
(seed, episode) — two machines produce bit-identical datasets.
"""

from __future__ import annotations

import os
from os.path import join

import numpy as np

# 9 characters: (name, shape, RGB). Colors are far apart in RGB so color
# identity survives bilinear resize and GAN blur; shapes cycle through the
# three rasterizers below.
CHARACTERS = (
    ("red-circle", "circle", (220, 55, 45)),
    ("green-square", "square", (60, 200, 75)),
    ("blue-triangle", "triangle", (55, 90, 225)),
    ("yellow-circle", "circle", (235, 210, 60)),
    ("magenta-square", "square", (205, 65, 205)),
    ("cyan-triangle", "triangle", (65, 205, 215)),
    ("orange-circle", "circle", (240, 145, 45)),
    ("purple-square", "square", (135, 70, 220)),
    ("white-triangle", "triangle", (235, 235, 235)),
)

MIN_LEN = 4  # clip index followings (VIDEO_LEN = MIN_LEN + 1 = 5)
DESC_DIM, ATTR_DIM, SUB_DIM = 128, 228, 128  # Pororo artifact vector widths


def _shape_mask(shape: str, size: int, cx: float, cy: float, r: float):
    """Boolean raster of one shape on a size x size grid."""
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    dx, dy = x - cx, y - cy
    if shape == "circle":
        return dx * dx + dy * dy <= r * r
    if shape == "square":
        return np.maximum(np.abs(dx), np.abs(dy)) <= r
    # upward triangle: apex at cy - r, base at cy + r
    return (dy >= -r) & (dy <= r) & (np.abs(dx) <= (dy + r) / 2.0)


def _episode_cast(rng: np.random.Generator, ep: int):
    """Per-episode scene parameters: cast (1-3 characters), and for each a
    trajectory (start, velocity, sinusoidal wobble), size and brightness."""
    n_cast = 1 + ep % 3  # every cast size equally represented
    cast = sorted(rng.choice(len(CHARACTERS), size=n_cast, replace=False).tolist())
    params = []
    for c in cast:
        params.append(
            {
                "char": int(c),
                "x0": float(rng.uniform(14, 50)),
                "y0": float(rng.uniform(14, 50)),
                "vx": float(rng.uniform(-1.6, 1.6)),
                "vy": float(rng.uniform(-1.6, 1.6)),
                "amp": float(rng.uniform(0.0, 3.0)),
                "freq": float(rng.uniform(0.3, 0.9)),
                "phase": float(rng.uniform(0, 2 * np.pi)),
                "radius": float(rng.uniform(6.0, 11.0)),
                "bright": float(rng.uniform(0.65, 1.0)),
            }
        )
    bg = rng.uniform(15, 55, size=3)  # dark per-episode background
    return params, bg


def _char_pos(p: dict, t: int, size: int):
    """Clamped smooth position of one character at frame t."""
    margin = p["radius"] + 1.0
    x = p["x0"] + p["vx"] * t + p["amp"] * np.sin(p["freq"] * t + p["phase"])
    y = p["y0"] + p["vy"] * t + p["amp"] * np.cos(p["freq"] * t + p["phase"])
    return (
        float(np.clip(x, margin, size - margin)),
        float(np.clip(y, margin, size - margin)),
    )


def render_frame(params, bg, t: int, size: int):
    """(frame uint8 HWC, seg uint8 HW) for one episode frame."""
    img = np.broadcast_to(
        np.asarray(bg, np.float32).reshape(1, 1, 3), (size, size, 3)
    ).copy()
    seg = np.zeros((size, size), np.float32)
    for p in params:  # fixed z-order: cast order
        cx, cy = _char_pos(p, t, size)
        m = _shape_mask(CHARACTERS[p["char"]][1], size, cx, cy, p["radius"])
        color = np.asarray(CHARACTERS[p["char"]][2], np.float32) * p["bright"]
        img[m] = color
        seg[m] = 255.0
    return img.astype(np.uint8), seg.astype(np.uint8)


def _frame_vectors(params, t: int, size: int):
    """(description 128-d, attributes 228-d, label 9-d, raw text) for one
    frame. Slotted layout: description dims [5c:5c+5] = (present, x/size,
    y/size, radius/16, brightness) for character c; attribute dims
    [2c:2c+2] = (radius/16, brightness). Unused dims stay 0 — a linear
    probe recovers the full scene, so the conditioning is informative by
    construction."""
    desc = np.zeros(DESC_DIM, np.float32)
    attr = np.zeros(ATTR_DIM, np.float32)
    label = np.zeros(len(CHARACTERS), np.float32)
    words = []
    for p in params:
        c = p["char"]
        cx, cy = _char_pos(p, t, size)
        desc[5 * c : 5 * c + 5] = (1.0, cx / size, cy / size, p["radius"] / 16.0,
                                   p["bright"])
        attr[2 * c : 2 * c + 2] = (p["radius"] / 16.0, p["bright"])
        label[c] = 1.0
        words.append(f"{CHARACTERS[c][0]}@({cx:.0f},{cy:.0f})")
    return desc, attr, label, " ".join(words)


def write_procedural_pororo(
    root: str,
    n_episodes: int = 48,
    frames_per_episode: int = 19,
    size: int = 64,
    seed: int = 0,
    test_frac: float = 0.15,
) -> dict:
    """Write the dataset under `root` (created if needed). Returns a summary
    dict. Layout is exactly what VideoFolderDataset/StoryDataset/ImageDataset
    consume — point cfg.DATA_DIR here and run the Pororo CLI unchanged."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("procedural dataset generation needs PIL") from e

    assert frames_per_episode > MIN_LEN, "episodes must yield at least one clip"
    os.makedirs(root, exist_ok=True)
    seg_dir = join(root, "img_segment")
    os.makedirs(seg_dir, exist_ok=True)

    labels, counter = {}, {}
    desc_vec, desc_attr, subs, desc_raw = {}, {}, {}, {}
    for ep in range(n_episodes):
        ep_name = f"ep{ep:03d}"
        ep_dir = join(root, ep_name)
        os.makedirs(ep_dir, exist_ok=True)
        rng = np.random.default_rng([seed, ep])
        params, bg = _episode_cast(rng, ep)
        counter[ep_name + "/"] = frames_per_episode
        # frames are 1-based like the reference's Pororo artifacts: the clip
        # index keeps frame_id <= counter - MIN_LEN, whose followings reach
        # frame_id + MIN_LEN — which only exists on disk if names run 1..F
        for t in range(1, frames_per_episode + 1):
            frame_id = f"{ep_name}/{t}"
            img, seg = render_frame(params, bg, t, size)
            Image.fromarray(img).save(join(ep_dir, f"{t}.png"))
            # seg naming: "<ep>_<n>.png" under img_segment/ — the exact
            # ImageDataset convention ("_".join(sub_path.split("/")[-2:]))
            Image.fromarray(seg, mode="L").save(join(seg_dir, f"{ep_name}_{t}.png"))
            d, a, lab, raw = _frame_vectors(params, t, size)
            labels[frame_id] = lab
            desc_vec[frame_id] = np.stack([d])        # one description each
            desc_attr[frame_id] = np.stack([a])
            subs[frame_id] = np.zeros((1, SUB_DIM), np.float32)
            desc_raw[frame_id] = [raw]

    np.save(join(root, "labels.npy"), np.array(labels, dtype=object))
    np.save(join(root, "frames_counter.npy"), np.array(counter, dtype=object))
    np.save(join(root, "descriptions_vec.npy"), np.array(desc_vec, dtype=object))
    np.save(join(root, "descriptions_attr.npy"), np.array(desc_attr, dtype=object))
    np.save(join(root, "subtitles_vec.npy"), np.array(subs, dtype=object))
    np.save(join(root, "descriptions.npy"), np.array(desc_raw, dtype=object))

    # train/test split: indices into the clip index arrays. With 1-based
    # frame names the index keeps ids 1..F-MIN_LEN per episode, so the
    # total is n_episodes * (F - MIN_LEN); the ids themselves are just a
    # permutation split of that range (order within it is irrelevant).
    total = n_episodes * (frames_per_episode - MIN_LEN)
    split_rng = np.random.default_rng([seed, 10_000])
    order = split_rng.permutation(total)
    n_test = max(1, int(round(total * test_frac)))
    train_ids = np.sort(order[n_test:]).astype(np.int64)
    test_ids = np.sort(order[:n_test]).astype(np.int64)
    np.save(
        join(root, "train_test_ids.npy"),
        np.array([train_ids, test_ids], dtype=object),
    )
    return {
        "root": root,
        "episodes": n_episodes,
        "frames": n_episodes * frames_per_episode,
        "clips": total,
        "train_clips": int(train_ids.size),
        "test_clips": int(test_ids.size),
    }


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("root", help="output DATA_DIR")
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--frames", type=int, default=19)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    info = write_procedural_pororo(
        args.root, args.episodes, args.frames, args.size, args.seed
    )
    print(info)


if __name__ == "__main__":  # pragma: no cover
    main()
