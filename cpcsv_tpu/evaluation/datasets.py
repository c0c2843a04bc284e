"""Evaluation-side datasets.

Folder readers (reference `miscc/datasets.py:19-55`) read dumped story
folders back for metric computation; generator wrappers (reference
`fid/utils.py:12-87`, `utils.py:14-49`) sample the model on the fly.
All return NHWC float32 in [-1,1] (matching the training transforms).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import numpy as np

from cpcsv_tpu.data.transforms import normalize_image

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class FolderStoryDataset:
    """story dirs each holding {0..T-1}.png (reference FolderStoryDataset)."""

    def __init__(self, img_folder: str, video_len: int = 5, imsize: int = 64):
        self.img_folder = img_folder
        self.stories = sorted(os.listdir(img_folder))
        self.video_len = video_len
        self.imsize = imsize

    def __len__(self):
        return len(self.stories)

    def __getitem__(self, item):
        d = os.path.join(self.img_folder, self.stories[item])
        frames = []
        for t in range(self.video_len):
            im = Image.open(os.path.join(d, f"{t}.png")).convert("RGB")
            frames.append(normalize_image(np.array(im), self.imsize))
        return np.stack(frames, axis=0)  # (T,H,W,C)


class FolderImageDataset:
    """flat folder of pngs (reference FolderImageDataset); also accepts the
    nested story layout and flattens it."""

    def __init__(self, img_folder: str, imsize: int = 64):
        self.imsize = imsize
        self.files = []
        for root, _, files in os.walk(img_folder):
            for f in sorted(files):
                if f.endswith(".png"):
                    self.files.append(os.path.join(root, f))
        self.files.sort()

    def __len__(self):
        return len(self.files)

    def __getitem__(self, item):
        im = Image.open(self.files[item]).convert("RGB")
        return normalize_image(np.array(im), self.imsize)


class IgnoreLabelDataset:
    """dict dataset -> just its 'images' (reference utils.py:12-20)."""

    def __init__(self, orig, key: str = "images"):
        self.orig = orig
        self.key = key

    def __len__(self):
        return len(self.orig)

    def __getitem__(self, index):
        return np.asarray(self.orig[index][self.key])


@partial(jax.jit, static_argnums=0)
def _sample_videos_jit(net_g, variables, motion, content, key):
    # module-level jit, net_g static: flax Modules hash by their config
    # fields, so the trainer's per-epoch StoryGANDataset instances (same
    # net_g, fresh variables) reuse ONE compiled program instead of
    # re-tracing the whole generator every epoch
    return net_g.apply(
        variables, motion, content, False, False,
        method="sample_videos", rngs={"noise": key},
    ).image


class StoryGANDataset:
    """Samples the generator per story (reference fid/utils.py:52-87) —
    but batched: generation happens in jitted chunks, not one story per
    __getitem__ (the reference runs a full forward per item)."""

    # chunk=64: measured on v5e (tools/bench_inference.py) — 11.4k frames/s
    # at batch 18 vs 17.1k at batch 72; larger chunks amortize dispatch and
    # fill the MXU. The final partial chunk costs one extra compile.
    def __init__(self, net_g, variables, testdataset, rng, text_dim: int = 356,
                 chunk: int = 64, mesh=None):
        self.net_g = net_g
        self.variables = variables
        self.ds = testdataset
        self.text_dim = text_dim
        self.chunk = chunk
        self.rng = rng
        self.mesh = mesh  # multi-device: full chunks shard over the batch axis
        self._shard_cache: dict = {}
        self._cache: dict[int, np.ndarray] = {}
        self._real_cache: dict[int, np.ndarray] = {}
        self._gen_jit = partial(_sample_videos_jit, net_g)

    def __len__(self):
        return len(self.ds)

    # subclasses set True to also keep the REAL frames of the exact dataset
    # item the generation consumed (a second ds[i] fetch would redraw random
    # crops/descriptions AND pay another decode)
    keep_real = False

    def _generate_chunk(self, start: int):
        idxs = list(range(start, min(start + self.chunk, len(self.ds))))
        motions, contents = [], []
        for i in idxs:
            item = self.ds[i]
            desc = np.asarray(item["description"], np.float32)[:, : self.text_dim]
            labels = np.asarray(item["labels"], np.float32)
            motions.append(np.concatenate([desc, labels], axis=1))
            contents.append(desc)
            if self.keep_real:
                self._real_cache[i] = np.asarray(item["images"], np.float32)
        # host arrays: shard_eval_inputs transfers once into the target
        # sharding (jnp.asarray here would pay default-device + reshard)
        motion = np.stack(motions)
        content = np.stack(contents)
        key = jax.random.fold_in(self.rng, start)
        # data-parallel generation over the mesh: full chunks shard their
        # batch axis, the ragged tail chunk runs unsharded (its own compile
        # either way). RNG values are a function of logical shape only, so
        # sharded == unsharded output for the same key.
        from cpcsv_tpu.parallel.mesh import shard_eval_inputs

        (motion, content), variables = shard_eval_inputs(
            self.mesh, (motion, content), self.variables, self._shard_cache
        )
        fake = np.asarray(
            self._gen_jit(variables, motion, content, key), np.float32
        )
        for j, i in enumerate(idxs):
            self._cache[i] = fake[j]

    def __getitem__(self, index):
        if index not in self._cache:
            self._generate_chunk((index // self.chunk) * self.chunk)
        return self._cache[index]


class StoryGANSSIMDataset(StoryGANDataset):
    """(fake, real) pairs for SSIM (reference utils.py StoryGANSSIMDataset).

    The real story is the SAME dataset item the generation consumed (kept
    during _generate_chunk) — re-fetching ds[index] would redraw the random
    strip crops / description picks and score the fake against a different
    real sample."""

    keep_real = True

    def __getitem__(self, index):
        fake = super().__getitem__(index)
        return fake, self._real_cache[index]
