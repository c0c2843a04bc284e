"""Shared helper for the committed converter golden fixtures.

`synth_state_dict` regenerates the exact synthetic torch-layout state dict
used by tools/gen_golden_fixtures.py from key names + shapes alone, so the
fixture npz only needs to commit keys/shapes/input/expected-output (a few
hundred KB) instead of full ~100 MB state dicts. Per-key values come from a
crc32-seeded numpy Philox stream — stable across Python versions and runs.
"""

from __future__ import annotations

import os
import zlib

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _key_rng(key: str, seed: int = 0) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(zlib.crc32(key.encode()) + seed))


def synth_state_dict(keys_shapes, seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic, numerically sane synthetic state dict.

    Rules by key name/shape (keeps activations bounded through deep nets):
      * running_var            -> U(0.9, 1.1)
      * running_mean           -> N(0, 0.02)
      * num_batches_tracked    -> 0 (int64 scalar)
      * weight with ndim >= 2  -> kaiming-ish N(0, sqrt(2/fan_in))
      * weight with ndim == 1  -> 1 + N(0, 0.02)   (BN scale)
      * bias / anything else   -> N(0, 0.02)
    """
    out = {}
    for key, shape in keys_shapes:
        shape = tuple(int(s) for s in shape)
        rng = _key_rng(key, seed)
        leaf = key.rsplit(".", 1)[-1]
        if leaf == "running_var":
            arr = rng.uniform(0.9, 1.1, shape)
        elif leaf == "running_mean":
            arr = rng.normal(0.0, 0.02, shape)
        elif leaf == "num_batches_tracked":
            out[key] = np.zeros(shape, np.int64)
            continue
        elif leaf == "weight" and len(shape) >= 2:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.normal(0.0, np.sqrt(2.0 / fan_in), shape)
        elif leaf == "weight":
            arr = 1.0 + rng.normal(0.0, 0.02, shape)
        else:
            arr = rng.normal(0.0, 0.02, shape)
        out[key] = arr.astype(np.float32)
    return out


def load_fixture(name: str):
    """Returns (state_dict, x, expected) for fixture `name`."""
    path = os.path.join(FIXTURE_DIR, f"{name}_golden.npz")
    data = np.load(path, allow_pickle=False)
    keys = [str(k) for k in data["keys"]]
    shapes = [
        tuple(int(v) for v in s.split(",") if v) for s in (str(x) for x in data["shapes"])
    ]
    sd = synth_state_dict(list(zip(keys, shapes)))
    return sd, data["x"], data["expected"]
