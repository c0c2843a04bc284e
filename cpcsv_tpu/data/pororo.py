"""Pororo-SV dataset pipeline — same on-disk artifact protocol as the
reference (`datasets/pororo.py`):

  DATA_DIR/
    <episode dirs>/<frame>.png      vertical strips of square frames
    labels.npy                      dict id -> 9-dim character one-hot
    frames_counter.npy              dict "<episode>/" -> frame count
                                    (leading-slash keys also accepted)
    img_cache4.npy following_cache4.npy   clip index caches
    train_test_ids.npy              (train_ids, test_ids)
    descriptions_vec.npy (128-d), descriptions_attr.npy (228-d),
    subtitles_vec.npy, descriptions.npy (raw text)
    img_segment/ (or img_segment_refine/) figure-ground masks

Output schema matches the reference loaders; images are NHWC float32 in
[-1,1], videos (T,H,W,C).
"""

from __future__ import annotations

import os
import re
import threading
from os.path import exists, join

import numpy as np

from cpcsv_tpu.data.transforms import normalize_image, video_transform

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_npy_dict(path):
    return np.load(path, allow_pickle=True, encoding="latin1").item()


def _frame_keyed(d: dict) -> dict:
    """Normalize frame-id dict keys to the canonical no-leading-slash form
    ("ep/1") so artifacts produced under either DATA_DIR slash convention
    load interchangeably."""
    return {_decode(k).lstrip("/"): v for k, v in d.items()}


class _SeededDraws:
    """Deterministic per-call child RNGs from one seeded master generator.

    The reference seeds numpy globally at CLI start; here each dataset owns
    a master rng (seed actually USED — it was dead plumbing before) and
    spawns a child per __getitem__ call, so sampling re-randomizes across
    epochs yet two runs with the same manualSeed see the same stream.
    Thread-safe (the DataLoader producer threads share dataset instances)."""

    def __init__(self, seed: int):
        self._seed = seed
        self._master = np.random.default_rng(seed)
        self._lock = threading.Lock()

    def reseed(self, epoch: int) -> None:
        """Re-derive the master stream from (seed, epoch). DataLoader
        .set_epoch calls this so a resumed run's epoch E draws the same
        crops/description picks as an uninterrupted run's epoch E."""
        with self._lock:
            self._master = np.random.default_rng([self._seed, epoch])

    def child(self) -> np.random.Generator:
        with self._lock:
            return np.random.default_rng(int(self._master.integers(0, 2**63)))


def _atomic_save(path: str, arr: np.ndarray) -> None:
    """np.save via temp file + os.replace so readers never see a partial
    file (shared DATA_DIR, concurrent multi-host cache builds). The temp
    suffix carries a uuid, not only the PID: two HOSTS writing the shared
    filesystem can hold the same PID, and a pid-only temp name would let
    their writes interleave into the very corruption this guards against."""
    import uuid

    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    np.save(tmp, arr)
    # np.save appends .npy when the name lacks it (ours does — uuid suffix)
    os.replace(f"{tmp}.npy", path)


def _decode(v) -> str:
    if isinstance(v, bytes):
        return v.decode("utf-8")
    v = str(v)
    if v.startswith("b'") or v.startswith('b"'):
        return v[2:-1]
    return v


class VideoFolderDataset:
    """Clip index (reference `datasets/pororo.py:12-68`): keep frame ids with
    >= min_len successors in the episode; cache; split train/test."""

    def __init__(self, folder, counter=None, cache=None, min_len=4, data_type="train"):
        assert data_type in ("train", "test", "valid")
        # Normalize to a TRAILING separator — the reference's canonical form
        # (its `folder + 'img_cache4.npy'` concats only work with one,
        # reference datasets/pororo.py:44-46), so frame names are stored as
        # "<ep>/<n>.png" and consumers do `dir_path + v_name`. Passing
        # DATA_DIR without the slash used to silently build an EMPTY index.
        folder = folder.rstrip(os.sep) + os.sep
        self.dir_path = folder
        self.labels = _frame_keyed(_load_npy_dict(join(folder, "labels.npy")))

        img_cache = join(cache or folder, f"img_cache{min_len}.npy")
        follow_cache = join(cache or folder, f"following_cache{min_len}.npy")
        if exists(img_cache) and exists(follow_cache):
            self.images = np.load(img_cache, allow_pickle=True, encoding="latin1")
            self.followings = np.load(follow_cache, allow_pickle=True, encoding="latin1")
        else:
            self.images, self.followings = self._build_index(folder, counter, min_len)
            if not self.images:
                raise RuntimeError(
                    f"Pororo clip index is EMPTY for {folder!r} — check DATA_DIR "
                    "and frames_counter.npy keys (refusing to cache an empty "
                    "index)"
                )
            # atomic writes: concurrent multi-host first runs must never
            # expose a partially written cache to another host's np.load
            _atomic_save(img_cache, np.array(self.images, dtype=object))
            _atomic_save(follow_cache, np.array(self.followings, dtype=object))
            self.images = np.array(self.images, dtype=object)
            self.followings = np.array(self.followings, dtype=object)

        train_id, test_id = np.load(
            join(folder, "train_test_ids.npy"), allow_pickle=True, encoding="latin1"
        )
        orders = np.array(train_id if data_type == "train" else test_id).astype("int32")
        self.images = self.images[orders]
        self.followings = self.followings[orders]

    @staticmethod
    def _build_index(folder, counter, min_len):
        images, followings = [], []
        # accept both frames_counter key conventions: the trailing-slash
        # DATA_DIR form "ep/" (reference-canonical) and the leading-slash
        # "/ep/" form (what a no-trailing-slash reference run produces)
        if counter is not None:
            counter = {str(k).lstrip("/"): v for k, v in counter.items()}
        # deterministic class-dir walk (replaces torchvision ImageFolder scan)
        entries = []
        for d in sorted(os.listdir(folder)):
            full = join(folder, d)
            if not os.path.isdir(full):
                continue
            for f in sorted(os.listdir(full)):
                if f.endswith(".png"):
                    entries.append(join(full, f))
        for img_path in entries:
            v_name = img_path.replace(folder, "")  # "<ep>/<n>.png"
            episode = re.sub(r"[0-9]+.png", "", v_name)
            if counter is None or episode not in counter:
                continue  # non-episode dirs (e.g. img_segment/) are skipped
            try:
                frame_id = int(os.path.basename(v_name).replace(".png", ""))
            except ValueError:
                continue
            if frame_id > counter[episode] - min_len:
                continue
            followings.append([episode + str(frame_id + i + 1) + ".png" for i in range(min_len)])
            images.append(v_name)
        return images, followings

    def sample_image(self, im, rng=None):
        """Crop one random square frame from a vertical strip
        (reference `datasets/pororo.py:54-58`)."""
        rng = rng or np.random.default_rng()
        shorter, longer = min(im.size), max(im.size)
        n = longer // shorter
        se = int(rng.integers(0, n))
        return im.crop((0, se * shorter, shorter, (se + 1) * shorter))

    def __getitem__(self, item):
        return [self.images[item]] + [str(f) for f in self.followings[item]]

    def __len__(self):
        return len(self.images)


class _TextArtifacts:
    def __init__(self, textvec):
        self.descriptions = _frame_keyed(_load_npy_dict(join(textvec, "descriptions_vec.npy")))
        self.attributes = _frame_keyed(_load_npy_dict(join(textvec, "descriptions_attr.npy")))
        self.subtitles = _frame_keyed(_load_npy_dict(join(textvec, "subtitles_vec.npy")))
        self.descriptions_original = _frame_keyed(_load_npy_dict(join(textvec, "descriptions.npy")))

    def pick(self, rng, frame_id):
        """Random description index when several exist. Reference quirk
        preserved: the draw is sized by the RAW-text list
        (descriptions_original, reference pororo.py:126,205) even though the
        index is applied to the embedded descriptions/attributes — the
        ImageDataset CONTENT loop sizes by the embedded list instead
        (reference :224-225); both conventions are replicated where the
        reference uses them."""
        n = len(self.descriptions_original[frame_id])
        return int(rng.integers(0, n)) if n > 1 else 0


class StoryDataset:
    """5-frame story samples (reference `datasets/pororo.py:70-154`)."""

    def __init__(self, dataset: VideoFolderDataset, textvec, imsize: int = 64, seed: int = 0):
        self.dataset = dataset
        self.dir_path = dataset.dir_path
        # textvec: dir path, or an already-loaded _TextArtifacts to share
        # (the four .npy dicts are large; loading them once per process
        # instead of once per dataset saves hundreds of MB of redundant I/O)
        self.text = textvec if isinstance(textvec, _TextArtifacts) else _TextArtifacts(textvec)
        self.labels = dataset.labels
        self.imsize = imsize
        self._draws = _SeededDraws(seed)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        rng = self._draws.child()
        lists = self.dataset[item]
        frames, des, subs, labels, attri, raw = [], [], [], [], [], []
        for v in lists:
            v = _decode(v).lstrip("/")  # tolerate either cache convention
            frame_id = v.replace(".png", "")
            im = Image.open(self.dir_path + frame_id + ".png").convert("RGB")
            frames.append(np.array(self.dataset.sample_image(im, rng)))
            se = self.text.pick(rng, frame_id)
            raw.append(self.text.descriptions_original[frame_id][se])
            des.append(self.text.descriptions[frame_id][se])
            subs.append(self.text.subtitles[frame_id][0])
            labels.append(self.labels[frame_id])
            attri.append(self.text.attributes[frame_id][se].astype("float32"))
        video = video_transform(np.stack(frames), self.imsize)  # (T,H,W,C)
        des = np.concatenate(
            [np.stack(des), np.stack(attri)], axis=1
        ).astype(np.float32)  # (T, 128+228=356)
        return {
            "images": video,
            "text": raw,
            "description": des,
            "subtitle": np.stack(subs).astype(np.float32),
            "labels": np.stack(labels).astype(np.float32),
        }


class ImageDataset:
    """Single-frame samples + per-story content matrix + optional seg mask
    (reference `datasets/pororo.py:157-248`)."""

    def __init__(
        self,
        dataset: VideoFolderDataset,
        textvec,
        imsize: int = 64,
        sesize: int = 64,
        use_segment: bool = False,
        segment_name: str = "img_segment",
        seed: int = 0,
    ):
        self.dataset = dataset
        self.dir_path = dataset.dir_path
        self.text = textvec if isinstance(textvec, _TextArtifacts) else _TextArtifacts(textvec)
        self.labels = dataset.labels
        self.imsize = imsize
        self.sesize = sesize
        self.use_segment = use_segment
        self.segment_name = segment_name
        self._draws = _SeededDraws(seed)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        # NB the seg mask and the image each draw their own random strip
        # crop below — a reference quirk preserved (reference sample_image
        # calls np.random independently per call, pororo.py:54-58,181-189)
        rng = self._draws.child()
        lists = self.dataset[item]
        sub_path = _decode(lists[0]).lstrip("/")  # either cache convention
        frame_id = sub_path.replace(".png", "")

        out = {}
        if self.use_segment:
            seg_path = "{}/{}/{}".format(
                self.dir_path, self.segment_name, "_".join(sub_path.split("/")[-2:])
            )
            seg = Image.open(seg_path).convert("L")
            out["images_seg"] = normalize_image(
                np.array(self.dataset.sample_image(seg, rng)), self.sesize
            )

        im = Image.open(self.dir_path + sub_path).convert("RGB")
        out["images"] = normalize_image(
            np.array(self.dataset.sample_image(im, rng)), self.imsize
        )

        se = self.text.pick(rng, frame_id)
        des = self.text.descriptions[frame_id][se]
        attri = self.text.attributes[frame_id][se].astype("float32")
        out["description"] = np.concatenate([des, attri]).astype(np.float32)
        out["subtitle"] = np.asarray(self.text.subtitles[frame_id][0], np.float32)
        out["labels"] = self.labels[frame_id].astype(np.float32)
        out["text"] = self.text.descriptions_original[frame_id][se]

        content, attri_c, label_c = [], [], []
        for v in lists:
            vid = _decode(v).lstrip("/").replace(".png", "")
            # reference quirk: the CONTENT draw is sized by the EMBEDDED
            # description list (reference pororo.py:224-225), unlike pick()
            # above which sizes by the raw-text list — see _TextArtifacts.pick
            n = len(self.text.descriptions[vid])
            se = int(rng.integers(0, n)) if n > 1 else 0
            content.append(self.text.descriptions[vid][se])
            attri_c.append(self.text.attributes[vid][se].astype("float32"))
            label_c.append(self.labels[vid].astype("float32"))
        out["content"] = np.concatenate(
            [np.stack(content), np.stack(attri_c), np.stack(label_c)], axis=1
        ).astype(np.float32)  # (T, 128+228+9=365)
        return out


def build_pororo_loaders(cfg, seed: int = 0):
    """Reference main_pororo.py:97-121: train story/image loaders + test loader."""
    from cpcsv_tpu.data.loader import DataLoader
    from cpcsv_tpu.parallel.distributed import process_info
    from cpcsv_tpu.parallel.mesh import mesh_size

    n_dev = mesh_size(cfg.MESH_SHAPE)  # reference: batch x num_gpu
    pi, pc = process_info()  # per-host input pipeline in multi-host runs
    dir_path = cfg.DATA_DIR
    counter = _load_npy_dict(join(dir_path, "frames_counter.npy"))
    base = VideoFolderDataset(dir_path, counter, cache=dir_path, min_len=4, data_type="train")
    # distinct seed offsets per dataset so manualSeed actually drives the
    # crop/description sampling streams (the reference seeds numpy globally
    # at CLI start; loaders below use seed..seed+2 for shuffling)
    text = _TextArtifacts(dir_path)  # loaded ONCE, shared by all 3 datasets
    story = StoryDataset(base, text, cfg.IMSIZE, seed=seed + 10)
    image = ImageDataset(
        base,
        text,
        cfg.IMSIZE,
        cfg.SESIZE,
        use_segment=cfg.SEGMENT_LEARNING,
        segment_name=cfg.TRAIN.SEGMENT_NAME,
        seed=seed + 11,
    )
    base_test = VideoFolderDataset(dir_path, counter, cache=dir_path, min_len=4, data_type="test")
    test_story = StoryDataset(base_test, text, cfg.IMSIZE, seed=seed + 12)

    imageloader = DataLoader(
        image, cfg.TRAIN.IM_BATCH_SIZE * n_dev, shuffle=True, drop_last=True,
        seed=seed, process_index=pi, process_count=pc,
    )
    storyloader = DataLoader(
        story, cfg.TRAIN.ST_BATCH_SIZE * n_dev, shuffle=True, drop_last=True,
        seed=seed + 1, process_index=pi, process_count=pc,
    )
    testloader = DataLoader(
        test_story, cfg.TRAIN.ST_BATCH_SIZE * n_dev, shuffle=False, drop_last=True,
        seed=seed + 2, process_index=pi, process_count=pc,
    )
    return imageloader, storyloader, testloader
