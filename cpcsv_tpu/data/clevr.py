"""CLEVR-for-StoryGAN loaders (reference `datasets/clevr.py`).

Artifacts: CLEVR_dict.npy mapping "<id>_<t>" -> 18-d per-frame attribute
code; frames CLEVR_new_%06d_%d.png and masks CLEVR_new_%06d_%d_mask.png.
Stories are 4 frames; labels are cumulative-OR slices of the attribute code
(8-d label from dims 2:10 for the image path; 15-d super_label for stories
from dims [0:2]+[2:10 OR]+[13:18]) — reference `datasets/clevr.py:43-53,111-117`.

Known reference bug NOT replicated: `__len__ = edn - srt + 1` (off-by-one,
reference :68,136); here the range is exact.
"""

from __future__ import annotations

from os.path import join

import numpy as np

from cpcsv_tpu.data.pororo import _SeededDraws
from cpcsv_tpu.data.transforms import normalize_image, video_transform

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_dict(folder):
    return np.load(join(folder, "CLEVR_dict.npy"), allow_pickle=True, encoding="latin1").item()


class ClevrStoryDataset:
    def __init__(self, image_path, data_type="train", video_len=4, imsize=64):
        self.dir_path = image_path
        self.descriptions = _load_dict(image_path)
        self.video_len = video_len
        self.imsize = imsize
        if data_type == "train":
            self.srt, self.edn = 1, 10001
        else:
            self.srt, self.edn = 10001, 13001

    def __len__(self):
        return self.edn - self.srt

    def __getitem__(self, item):
        story_id = self.srt + item
        frames, des, labels = [], [], []
        attr = None
        super_labels = []
        for t in range(1, self.video_len + 1):
            path = join(self.dir_path, "CLEVR_new_%06d_%d.png" % (story_id, t))
            frames.append(np.array(Image.open(path).convert("RGB")))
            code = np.asarray(
                self.descriptions["%d_%d" % (story_id, t)], dtype=np.float32
            )
            attr = code if attr is None else np.maximum(attr, code)  # cumulative OR
            des.append(code)
            # NOTE deviation from the reference: its story path emits the 15-d
            # super_label (clevr.py:43-53) while its image path emits the 8-d
            # label — those can't feed the same motion_dim GRU; the reference's
            # clevr.yml was never shipped so the working dims are unknowable.
            # Here 'labels' is the 8-d cumulative object label on BOTH paths
            # (matches LABEL_NUM=8 in configs/clevr.yml); the 15-d super_label
            # is still provided under 'super_labels'.
            labels.append(attr[2:10].astype(np.float32))
            super_labels.append(
                np.concatenate([attr[:2], attr[2:10], attr[13:18]]).astype(np.float32)
            )
        video = video_transform(np.stack(frames), self.imsize)
        return {
            "images": video,
            "description": np.stack(des),
            "labels": np.stack(labels),
            "super_labels": np.stack(super_labels),
            "text": ["clevr %d frame %d" % (story_id, t)
                     for t in range(1, self.video_len + 1)],  # frames are 1-based
        }


class ClevrImageDataset:
    def __init__(
        self,
        image_path,
        data_type="train",
        video_len=4,
        imsize=64,
        sesize=64,
        use_segment=False,
        seed: int = 0,
    ):
        self.dir_path = image_path
        self._draws = _SeededDraws(seed)
        self.descriptions = _load_dict(image_path)
        self.video_len = video_len
        self.imsize = imsize
        self.sesize = sesize
        self.use_segment = use_segment
        if data_type == "train":
            self.srt, self.edn = 1, 10001
        else:
            self.srt, self.edn = 10001, 13001

    def __len__(self):
        return self.edn - self.srt

    def __getitem__(self, item):
        story_id = self.srt + item
        rng = self._draws.child()
        t = int(rng.integers(1, self.video_len + 1))

        path = join(self.dir_path, "CLEVR_new_%06d_%d.png" % (story_id, t))
        image = normalize_image(np.array(Image.open(path).convert("RGB")), self.imsize)

        content, attr = [], None
        label = None
        for tt in range(1, self.video_len + 1):
            code = np.asarray(
                self.descriptions["%d_%d" % (story_id, tt)], dtype=np.float32
            )
            attr = code if attr is None else np.maximum(attr, code)
            content.append(code)
            if tt == t:
                label = attr[2:10].astype(np.float32)  # 8-d cumulative label

        out = {
            "images": image,
            "description": np.asarray(
                self.descriptions["%d_%d" % (story_id, t)], np.float32
            ),
            "labels": label,
            "content": np.stack(content),
            "text": "clevr %d frame %d" % (story_id, t),
        }
        if self.use_segment:
            mpath = join(self.dir_path, "CLEVR_new_%06d_%d_mask.png" % (story_id, t))
            out["images_seg"] = normalize_image(
                np.array(Image.open(mpath).convert("L")), self.sesize
            )
        return out
