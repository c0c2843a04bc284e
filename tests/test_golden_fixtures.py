"""Converter layout regression tests against COMMITTED golden activations.

tools/gen_golden_fixtures.py produced each fixture by loading a
deterministic synthetic state dict (regenerated here from key names alone —
see golden_fixtures.synth_state_dict) into the fixed torch replica of the
real checkpoint layout and recording its forward output. These tests replay
the same state dict through the weight converter + Flax forward with NO
torch dependency: a layout regression in any converter (or in the Flax
architectures) breaks the comparison even on machines without the real
weight files (VERDICT round-1 item #3c).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golden_fixtures import FIXTURE_DIR, load_fixture


def _check(name, make_variables, model_apply, preprocess=lambda x: x,
           rtol=2e-2, atol=2e-3):
    if not os.path.exists(os.path.join(FIXTURE_DIR, f"{name}_golden.npz")):
        pytest.skip(f"fixture {name}_golden.npz not generated")
    sd, x, expected = load_fixture(name)
    variables = make_variables(sd)
    with jax.default_matmul_precision("highest"):
        out = np.asarray(model_apply(variables, jnp.asarray(preprocess(x))))
    np.testing.assert_allclose(out, expected, rtol=rtol, atol=atol)


def test_inception_golden_fixture():
    from cpcsv_tpu.evaluation.inception import (
        InceptionV3FID,
        load_torch_inception_state_dict,
    )

    model = InceptionV3FID()
    _check(
        "inception",
        load_torch_inception_state_dict,
        jax.jit(model.apply),
        preprocess=lambda x: (x + 1.0) / 2.0,  # fixture input is [-1,1]
    )


def test_r2plus1d_golden_fixture():
    from cpcsv_tpu.evaluation.r2plus1d import (
        R2Plus1D18,
        load_torch_r2plus1d_state_dict,
    )

    model = R2Plus1D18()
    _check("r2plus1d", load_torch_r2plus1d_state_dict, jax.jit(model.apply))


def test_i3d_golden_fixture():
    from cpcsv_tpu.evaluation.i3d import I3D, load_torch_i3d_state_dict

    model = I3D(resize_input=False, normalize_input=False)
    _check("i3d", load_torch_i3d_state_dict, jax.jit(model.apply))


def test_npz_state_dict_roundtrip(tmp_path):
    """weights.load_state_dict must read tools/port_metric_weights.py output
    identically to the torch dict it came from."""
    from cpcsv_tpu.evaluation.weights import load_state_dict

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
          "b.running_var": np.ones(4, np.float32)}
    p = str(tmp_path / "w.npz")
    np.savez(p, **sd)
    back = load_state_dict(p)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])
