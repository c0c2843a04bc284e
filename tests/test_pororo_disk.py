"""On-disk Pororo artifact-protocol test: build a miniature fake dataset
(strip pngs + the npy artifacts of SURVEY §2.2) and run the full loader
stack — clip index + caches, story/image datasets, seg masks, loaders."""

import os

import numpy as np
import pytest
from PIL import Image

from cpcsv_tpu.config import default_config, TrainConfig, CoeffConfig


def _make_fake_pororo(root, n_episodes=2, frames_per_ep=8, text_dim=128, attr_dim=228):
    rng = np.random.default_rng(0)
    root = str(root) + "/"
    labels, desc_vec, desc_attr, subs_vec, desc_raw = {}, {}, {}, {}, {}
    counter = {}
    for ep in range(n_episodes):
        ep_name = f"ep{ep}"
        ep_dir = os.path.join(root, ep_name)
        os.makedirs(ep_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "img_segment"), exist_ok=True)
        # reference artifact format: keys are "/<episode>/" WITH slashes
        # (build_frames_counter writes the same; datasets/pororo.py:21-45)
        counter[f"/{ep_name}/"] = frames_per_ep
        for i in range(1, frames_per_ep + 1):
            # vertical strip of 2 square frames, 32x32 each
            strip = rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)
            Image.fromarray(strip).save(os.path.join(ep_dir, f"{i}.png"))
            seg = rng.integers(0, 255, (64, 32), dtype=np.uint8)
            Image.fromarray(seg, "L").save(
                os.path.join(root, "img_segment", f"{ep_name}_{i}.png")
            )
            fid = f"{ep_name}/{i}"
            labels[fid] = (rng.random(9) < 0.3).astype(np.float32)
            desc_vec[fid] = [rng.standard_normal(text_dim).astype(np.float32)]
            desc_attr[fid] = [rng.standard_normal(attr_dim).astype(np.float32)]
            subs_vec[fid] = [rng.standard_normal(128).astype(np.float32)]
            desc_raw[fid] = [f"frame {fid}"]
    np.save(root + "labels.npy", labels)
    np.save(root + "descriptions_vec.npy", desc_vec)
    np.save(root + "descriptions_attr.npy", desc_attr)
    np.save(root + "subtitles_vec.npy", subs_vec)
    np.save(root + "descriptions.npy", desc_raw)
    np.save(root + "frames_counter.npy", counter)
    # ids into the post-filter clip list: frames 1..4 of each episode qualify
    n_clips = n_episodes * (frames_per_ep - 4)
    ids = np.arange(n_clips)
    np.save(
        root + "train_test_ids.npy",
        np.array([ids[: n_clips - 2], ids[n_clips - 2 :]], dtype=object),
    )
    return root, counter


def test_pororo_loaders_end_to_end(tmp_path):
    from cpcsv_tpu.data.pororo import build_pororo_loaders

    root, counter = _make_fake_pororo(tmp_path)
    cfg = default_config().with_updates(
        DATA_DIR=root,
        SEGMENT_LEARNING=True,
        MESH_SHAPE="data:1",
        TRAIN=TrainConfig(
            IM_BATCH_SIZE=2, ST_BATCH_SIZE=2, SEGMENT_NAME="img_segment",
            COEFF=CoeffConfig(KL=1.0),
        ),
    )
    imageloader, storyloader, testloader = build_pororo_loaders(cfg)

    st = next(iter(storyloader))
    assert st["images"].shape == (2, 5, 64, 64, 3)
    assert st["description"].shape == (2, 5, 356)
    assert st["labels"].shape == (2, 5, 9)
    assert st["images"].min() >= -1.0 and st["images"].max() <= 1.0

    im = next(iter(imageloader))
    assert im["images"].shape == (2, 64, 64, 3)
    assert im["description"].shape == (2, 356)
    assert im["content"].shape == (2, 5, 365)
    assert im["images_seg"].shape == (2, 64, 64, 1)

    # cache files were created (reference datasets/pororo.py:23-45 protocol)
    assert os.path.exists(os.path.join(root, "img_cache4.npy"))
    assert os.path.exists(os.path.join(root, "following_cache4.npy"))

    # second construction hits the cache
    imageloader2, _, _ = build_pororo_loaders(cfg)
    assert len(imageloader2.dataset) == len(imageloader.dataset)


def test_trailing_slash_data_dir_same_index(tmp_path):
    """A trailing slash in DATA_DIR must not change the clip index (it used
    to silently produce — and cache — an EMPTY index because the episode
    key lost its leading slash)."""
    from cpcsv_tpu.data.pororo import VideoFolderDataset

    root, counter = _make_fake_pororo(tmp_path / "a")
    base = root.rstrip("/")
    ds_no_slash = VideoFolderDataset(base, counter, data_type="train")
    # fresh dir so the cache of the first build is not reused
    root2, counter2 = _make_fake_pororo(tmp_path / "b")
    ds_slash = VideoFolderDataset(root2, counter2, data_type="train")  # has "/"
    assert len(ds_no_slash) == len(ds_slash) > 0
    assert list(ds_no_slash.images) == list(ds_slash.images)


def test_empty_index_refuses_to_cache(tmp_path):
    """Wrong counter keys -> loud error, and no empty cache file left behind."""
    import pytest as _pytest

    from cpcsv_tpu.data.pororo import VideoFolderDataset

    root, _ = _make_fake_pororo(tmp_path)
    with _pytest.raises(RuntimeError, match="EMPTY"):
        VideoFolderDataset(root, {"/not-a-real-episode/": 8}, data_type="train")
    assert not os.path.exists(os.path.join(root, "img_cache4.npy"))


def test_dataset_sampling_is_seed_deterministic(tmp_path):
    """Same seed -> identical sampled batches; different seed -> different
    (the seed plumbing used to be dead)."""
    from cpcsv_tpu.data.pororo import (
        ImageDataset,
        StoryDataset,
        VideoFolderDataset,
    )

    root, counter = _make_fake_pororo(tmp_path)
    base = VideoFolderDataset(root, counter, data_type="train")

    def grab(seed):
        ds = StoryDataset(base, root, imsize=32, seed=seed)
        return np.stack([np.asarray(ds[i]["images"]) for i in range(3)])

    a, b, c = grab(7), grab(7), grab(8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_builder_threads_seed_into_datasets(tmp_path):
    """build_pororo_loaders must pass its seed to the dataset constructors:
    different manualSeed values get different crop/description streams, not
    just a different shuffle order (the datasets used to be pinned at the
    default seed=0)."""
    from cpcsv_tpu.data.pororo import build_pororo_loaders

    root, _ = _make_fake_pororo(tmp_path)
    cfg = default_config().with_updates(
        DATA_DIR=root,
        SEGMENT_LEARNING=True,
        MESH_SHAPE="data:1",
        TRAIN=TrainConfig(
            IM_BATCH_SIZE=2, ST_BATCH_SIZE=2, SEGMENT_NAME="img_segment",
            COEFF=CoeffConfig(KL=1.0),
        ),
    )

    def items(seed):
        _, storyloader, _ = build_pororo_loaders(cfg, seed=seed)
        # index the dataset directly so the loader's shuffle can't mask a
        # shared sampling stream
        return np.stack(
            [np.asarray(storyloader.dataset[i]["images"]) for i in range(3)]
        )

    a, b, c = items(7), items(7), items(8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gif_extract_preserves_numeric_order(tmp_path):
    """extract_all must order 10.gif AFTER 9.gif (lexicographic sort used to
    scramble the temporal sequence for episodes with 10+ scenes)."""
    from PIL import Image as PILImage

    from cpcsv_tpu.data.preprocess import extract_all

    scene = tmp_path / "scenes" / "ep1"
    scene.mkdir(parents=True)
    # 12 gifs, each a solid color encoding its index
    for i in range(1, 13):
        PILImage.new("RGB", (4, 4), (i * 20 % 256, 0, 0)).save(scene / f"{i}.gif")
    out = tmp_path / "out"
    n = extract_all(str(tmp_path / "scenes"), str(out))
    assert n == 12
    for i in range(1, 13):
        px = PILImage.open(out / "ep1" / f"{i}.png").getpixel((0, 0))
        assert px[0] == i * 20 % 256, f"frame {i} out of order: {px}"
