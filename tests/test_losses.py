"""Golden tests: loss math vs torch reference implementations."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from cpcsv_tpu.losses import (
    bce_with_logits,
    check_is_order,
    create_random_shuffle,
    kl_loss,
    multi_label_accuracy,
    multilabel_soft_margin,
)
from cpcsv_tpu.losses.gan_losses import discriminator_loss, generator_loss


def test_bce_matches_torch_sigmoid_bce():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(50).astype(np.float32) * 3
    targets = (rng.random(50) < 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.array(logits), jnp.array(targets)))
    ref = float(
        nn.BCELoss()(torch.sigmoid(torch.tensor(logits)), torch.tensor(targets))
    )
    assert abs(ours - ref) < 1e-5


def test_multilabel_soft_margin_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((10, 9)).astype(np.float32)
    targets = (rng.random((10, 9)) < 0.3).astype(np.float32)
    ours = float(multilabel_soft_margin(jnp.array(logits), jnp.array(targets)))
    ref = float(
        nn.MultiLabelSoftMarginLoss()(torch.tensor(logits), torch.tensor(targets))
    )
    assert abs(ours - ref) < 1e-5


def test_kl_loss_matches_reference_formula():
    rng = np.random.default_rng(2)
    mu = rng.standard_normal((8, 124)).astype(np.float32)
    logvar = rng.standard_normal((8, 124)).astype(np.float32)
    ours = float(kl_loss(jnp.array(mu), jnp.array(logvar)))
    # reference miscc/utils.py:184-188
    t_mu, t_lv = torch.tensor(mu), torch.tensor(logvar)
    element = t_mu.pow(2).add_(t_lv.exp()).mul_(-1).add_(1).add_(t_lv)
    ref = float(torch.mean(element).mul_(-0.5))
    assert abs(ours - ref) < 1e-5


def test_multi_label_accuracy():
    logits = jnp.array([[10.0, -10.0], [10.0, 10.0]])
    targets = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    # positives: 3, predicted>=0.5 among positives: 3
    assert float(multi_label_accuracy(logits, targets)) == 1.0
    targets2 = jnp.array([[1.0, 1.0], [1.0, 1.0]])
    assert abs(float(multi_label_accuracy(logits, targets2)) - 0.75) < 1e-6


def test_discriminator_loss_algebra():
    B = 6
    rl = jnp.full((B,), 5.0)  # confident real
    wl = jnp.full((B - 1,), -5.0)  # confident not-wrong
    fl = jnp.full((B,), -5.0)  # confident fake
    out = discriminator_loss(rl, wl, fl, None, None)
    # total = real + 0.5*(fake+wrong) -> all near zero BCE
    assert float(out.total) < 0.05
    assert float(out.real) < 0.05


def test_generator_loss_wants_ones():
    fl_good = jnp.full((4,), 8.0)
    fl_bad = jnp.full((4,), -8.0)
    assert float(generator_loss(fl_good, None, None).total) < float(
        generator_loss(fl_bad, None, None).total
    )


def test_infonce_basic_properties():
    from cpcsv_tpu.losses.gan_losses import infonce_loss

    B = 8
    # strongly diagonal matrix -> near-zero loss
    strong = jnp.eye(B) * 20.0 - 10.0
    assert float(infonce_loss(strong)) < 1e-3
    # uniform matrix -> exactly log(B)
    assert abs(float(infonce_loss(jnp.zeros((B, B)))) - np.log(B)) < 1e-6
    # anti-diagonal (matched pairs scored worst) -> large loss
    assert float(infonce_loss(-strong)) > np.log(B)


def test_infonce_high_temperature_matches_pairwise_margin_ordering():
    """As tau -> inf, infonce linearizes to log B + (mean_j l_ij - l_ii)/tau,
    so its ordering over candidate logit matrices must match the
    positive-vs-negative margin that the reference's wrong-pair BCE drives
    (reference miscc/utils.py:77-80 pushes l_ii up, off-diagonal down)."""
    from cpcsv_tpu.losses.gan_losses import infonce_loss

    rng = np.random.default_rng(7)
    B, tau = 6, 1e4
    losses, margins = [], []
    for _ in range(20):
        m = rng.standard_normal((B, B)).astype(np.float32) * 3
        losses.append(float(infonce_loss(jnp.array(m), tau)))
        margins.append(float(np.mean(np.diag(m)) - np.mean(m)))
    # larger positive-pair margin <=> smaller InfoNCE: orderings are inverse
    assert np.all(np.argsort(losses) == np.argsort(margins)[::-1])


def test_discriminator_loss_infonce_slot():
    from cpcsv_tpu.losses.gan_losses import infonce_loss

    B = 5
    rng = np.random.default_rng(11)
    pair = jnp.array(rng.standard_normal((B, B)).astype(np.float32))
    rl = jnp.diagonal(pair)
    fl = jnp.full((B,), -5.0)
    out = discriminator_loss(rl, None, fl, None, None, pair_logits=pair)
    expected_wrong = float(infonce_loss(pair))
    assert abs(float(out.wrong) - expected_wrong) < 1e-6
    # total = real + 0.5*(fake + infonce)
    expect_total = float(out.real) + 0.5 * (float(out.fake) + expected_wrong)
    assert abs(float(out.total) - expect_total) < 1e-5


def test_create_random_shuffle_shapes_and_labels():
    rng = np.random.default_rng(3)
    stories = rng.standard_normal((14, 5, 8, 8, 3)).astype(np.float32)
    out, labels = create_random_shuffle(stories, rng=np.random.default_rng(0))
    assert out.shape == stories.shape
    assert labels.shape == (14,)
    for i, lab in enumerate(labels):
        if lab == 0:
            np.testing.assert_array_equal(out[i], stories[i])
        else:
            assert not np.array_equal(out[i], stories[i])


def test_check_is_order():
    assert check_is_order([0, 1, 2, 3])
    assert not check_is_order([1, 0, 2, 3])
