"""Generate committed golden activation fixtures for the three metric-weight
converters (VERDICT round 1, next-round item #3c).

Each fixture pins the converter layout WITHOUT shipping real weights: a
deterministic synthetic state_dict (regenerable from key names alone — see
tests/golden_fixtures.py:synth_state_dict) is loaded into the fixed-seed
torch replica (the same replicas as tests/test_*_port.py), the replica's
forward output on a fixed input is recorded, and only
{keys, shapes, input, expected-output} are committed (a few hundred KB, not
the ~100 MB state dicts). tests/test_golden_fixtures.py then replays the
synthetic state_dict through the converter + Flax forward with NO torch
dependency and compares against the committed activations.

Run from the repo root: python tools/gen_golden_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from golden_fixtures import FIXTURE_DIR, synth_state_dict  # noqa: E402


def build_fixture(name, torch_model, input_shape, to_torch_input, forward):
    sd = torch_model.state_dict()
    keys = sorted(sd.keys())
    shapes = [tuple(sd[k].shape) for k in keys]
    synth = synth_state_dict(list(zip(keys, shapes)))
    torch_model.load_state_dict(
        {k: torch.tensor(v) for k, v in synth.items()}, strict=True
    )
    torch_model.eval()

    rng = np.random.default_rng(1234)
    x = rng.uniform(-1, 1, input_shape).astype(np.float32)
    with torch.no_grad():
        expected = forward(torch_model, to_torch_input(torch.tensor(x))).numpy()

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    out = os.path.join(FIXTURE_DIR, f"{name}_golden.npz")
    np.savez(
        out,
        keys=np.array(keys),
        shapes=np.array([",".join(map(str, s)) for s in shapes]),
        x=x,
        expected=expected,
    )
    print(f"{out}: {len(keys)} tensors, input {x.shape}, output {expected.shape}")


def main():
    from test_inception_port import TorchFIDInception
    from test_r2plus1d_port import TorchR2Plus1D18
    from test_i3d_port import TorchI3D

    # inception expects [0,1] NHWC -> torch NCHW
    build_fixture(
        "inception",
        TorchFIDInception(),
        (2, 64, 64, 3),
        lambda t: ((t + 1) / 2).permute(0, 3, 1, 2),
        lambda m, t: m(t),
    )
    # r2plus1d expects (N,T,H,W,C) -> torch (N,C,T,H,W)
    build_fixture(
        "r2plus1d",
        TorchR2Plus1D18(),
        (2, 5, 64, 64, 3),
        lambda t: t.permute(0, 4, 1, 2, 3),
        lambda m, t: m(t),
    )
    build_fixture(
        "i3d",
        TorchI3D(),
        (2, 10, 64, 64, 3),
        lambda t: t.permute(0, 4, 1, 2, 3),
        lambda m, t: m(t),
    )


if __name__ == "__main__":
    main()
