"""Reproducibility: same seeds -> bitwise-identical training metrics
(explicit RNG keys + seeded loaders; the reference's global seeding at
main_pororo.py:52-56 gives only best-effort reproducibility)."""

import jax
import numpy as np

from tests.test_train_steps import make_batches, tiny_cfg


def _run(seed):
    from cpcsv_tpu.models import build_models
    from cpcsv_tpu.train import create_train_state, make_train_steps

    cfg = tiny_cfg(CASCADE_MODEL=False, SEGMENT_LEARNING=True)
    models = build_models(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(seed), models)
    d_step, g_step = make_train_steps(cfg, models)
    rng = np.random.default_rng(0)
    st_batch, im_batch = make_batches(cfg, rng)
    out = []
    for i in range(2):
        state, dm = d_step(state, jax.random.PRNGKey(7 * i), st_batch, im_batch, 4e-4)
        state, gm = g_step(state, jax.random.PRNGKey(9 * i), st_batch, im_batch, 1e-4)
        out.append((float(np.asarray(dm["img_D/loss"])), float(np.asarray(gm["G/loss"]))))
    return out


def test_same_seed_same_metrics():
    assert _run(3) == _run(3)


def test_different_seed_different_metrics():
    assert _run(3) != _run(4)


def test_inception_score_classifier_harness():
    import jax.numpy as jnp

    from cpcsv_tpu.evaluation.inception import make_inception_classifier
    from cpcsv_tpu.evaluation.inception_score import inception_score

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)

    clf = make_inception_classifier()
    mean, std = inception_score(DS(), clf, batch_size=4, splits=2)
    assert np.isfinite(mean) and mean >= 1.0
