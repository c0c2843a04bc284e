"""One-off Pororo preprocessing (reference `preprocess_pororo.py:9-103`):
extract the first frame of each `SceneDialogues/*/*.gif` episode to png and
build the text-vector dict. Pure PIL/numpy; pandas only if the description
CSV path is used."""

from __future__ import annotations

import os
from os.path import join

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def extract_frames(in_gif: str, out_png: str) -> int:
    """First GIF frame -> png (reference extractFrames)."""
    frame = Image.open(in_gif)
    frame.seek(0)
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    frame.convert("RGB").save(out_png)
    return 1


def _numeric_key(filename: str):
    """Sort key preserving TEMPORAL order for numerically named files:
    lexicographic sort would order 1,10,11,...,2,... and silently scramble
    the frame sequence for any episode with 10+ scenes."""
    stem = filename.rsplit(".", 1)[0]
    try:
        return (0, int(stem), filename)
    except ValueError:
        return (1, 0, filename)


def extract_all(scene_dir: str, out_dir: str) -> int:
    """Walk SceneDialogues/*/*.gif, dump {episode}/{i}.png in temporal
    (numeric) scene order."""
    count = 0
    for ep in sorted(os.listdir(scene_dir)):
        ep_dir = join(scene_dir, ep)
        if not os.path.isdir(ep_dir):
            continue
        gifs = sorted(
            (f for f in os.listdir(ep_dir) if f.endswith(".gif")), key=_numeric_key
        )
        for i, gif in enumerate(gifs):
            count += extract_frames(join(ep_dir, gif), join(out_dir, ep, f"{i+1}.png"))
    return count


def build_frames_counter(img_dir: str, out_path: str | None = None) -> dict:
    """Episode -> frame count dict (the `frames_counter.npy` artifact)."""
    counter = {}
    for ep in sorted(os.listdir(img_dir)):
        ep_dir = join(img_dir, ep)
        if not os.path.isdir(ep_dir):
            continue
        n = len([f for f in os.listdir(ep_dir) if f.endswith(".png")])
        counter[f"/{ep}/"] = n
    if out_path:
        np.save(out_path, counter)  # loaded back with .item()
    return counter


def build_text_dict(csv_path: str, vec_lookup, out_path: str | None = None) -> dict:
    """id -> text vector dict (reference obtain_pororo_dict shape): given a
    csv of (id, description) rows and a `vec_lookup(text) -> np.ndarray`
    embedding fn (the reference used a pre-trained universal encoder)."""
    import pandas as pd

    df = pd.read_csv(csv_path, header=None, names=["id", "text"])
    out: dict[str, list[np.ndarray]] = {}
    for _, row in df.iterrows():
        out.setdefault(str(row["id"]), []).append(np.asarray(vec_lookup(row["text"])))
    if out_path:
        np.save(out_path, out)
    return out
