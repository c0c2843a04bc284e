"""GAN losses — the reference's exact loss algebra, jit-native.

Reference equivalents:
  * discriminator_loss <- compute_discriminator_loss (miscc/utils.py:48-123)
      real-pair BCE vs 1, wrong-pair (shifted conditions) BCE vs 0,
      fake-pair BCE vs 0; total = real + 0.5*(fake + wrong);
      + MultiLabelSoftMarginLoss on the real features' character head;
      + optional order-consistency BCE on shuffled real stories.
  * generator_loss <- compute_generator_loss (miscc/utils.py:126-171)
      BCE(fake logits, 1) + cate loss on fake features
      + optional consistency MSE(VidEnc(fake), stopgrad(VidEnc(real))).
  * kl_loss <- KL_loss (miscc/utils.py:184-188).

Heads return LOGITS here; `bce_with_logits` == Sigmoid+BCELoss numerically
(the reference applies Sigmoid inside D then nn.BCELoss). All functions are
pure and differentiable; discriminator/generator choose what to stop-grad.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid binary cross-entropy (== torch BCELoss(sigmoid(x)))."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return per.mean()


def multilabel_soft_margin(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch nn.MultiLabelSoftMarginLoss: mean over batch of the per-class
    mean of -[y*log σ(x) + (1-y)*log σ(-x)]."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = targets * jax.nn.log_sigmoid(logits) + (1.0 - targets) * jax.nn.log_sigmoid(
        -logits
    )
    return -(per.mean(axis=-1)).mean()


def kl_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """VAE KL to N(0,1): -0.5 * mean(1 + logvar - mu^2 - exp(logvar))."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    element = 1.0 + logvar - jnp.square(mu) - jnp.exp(logvar)
    return -0.5 * element.mean()


def multi_label_accuracy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Reference get_multi_acc (miscc/utils.py:313-321): fraction of positive
    labels whose sigmoid score >= 0.5."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    correct = jnp.sum((targets == 1) & (probs >= 0.5))
    return correct / jnp.maximum(jnp.sum(targets), 1.0)


def infonce_loss(pair_logits: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """Batch-wise InfoNCE over a (B, B) matrix of conditional-head logits,
    pair_logits[i, j] = D_cond(features_i, condition_j); diagonal = matched.

    EXTENSION, not parity: generalizes the reference's single-shifted
    wrong-pair BCE (miscc/utils.py:77-80) — which contrasts each feature
    against ONE mismatched condition — into a contrast against every other
    condition in the batch (CPC/InfoNCE form). Gate: cfg.USE_INFONCE.

    loss = -mean_i log softmax_j(pair_logits[i] / τ)[i]

    As τ→∞ the loss linearizes to log B + (mean_j l_ij - l_ii)/τ + O(1/τ²):
    its ordering over examples matches the positive-vs-negative logit margin
    that the pairwise BCE objective drives (tested in tests/test_losses.py).
    """
    m = pair_logits.astype(jnp.float32) / temperature
    log_probs = jax.nn.log_softmax(m, axis=-1)
    return -jnp.mean(jnp.diagonal(log_probs))


class DLossOut(NamedTuple):
    total: jnp.ndarray
    real: jnp.ndarray
    wrong: jnp.ndarray
    fake: jnp.ndarray
    accuracy: jnp.ndarray
    consistency: jnp.ndarray


def discriminator_loss(
    real_logits: jnp.ndarray,
    wrong_logits: jnp.ndarray,
    fake_logits: jnp.ndarray,
    cate_logits_real: Optional[jnp.ndarray],
    cate_labels: Optional[jnp.ndarray],
    order_logits: Optional[jnp.ndarray] = None,
    order_labels: Optional[jnp.ndarray] = None,
    consistency_ratio: float = 1.0,
    pair_logits: Optional[jnp.ndarray] = None,
    infonce_temperature: float = 1.0,
) -> DLossOut:
    """Combine per-head logits into the reference D loss.

    The caller computes logits:
      real_logits  = D.cond(D(real), cond)
      wrong_logits = D.cond(D(real)[:B-1], cond[1:])   (mismatched pairs)
      fake_logits  = D.cond(D(fake), cond)

    InfoNCE extension (cfg.USE_INFONCE): pass the (B, B) `pair_logits`
    matrix instead of `wrong_logits`; the batch-wise InfoNCE takes the wrong
    term's slot in `total = real + 0.5*(fake + wrong)`.
    """
    err_real = bce_with_logits(real_logits, jnp.ones_like(real_logits))
    if pair_logits is not None:
        err_wrong = infonce_loss(pair_logits, infonce_temperature)
    else:
        # wrong-pair set is empty at batch==1 (static shape; guard in python)
        err_wrong = (
            bce_with_logits(wrong_logits, jnp.zeros_like(wrong_logits))
            if wrong_logits.size > 0
            else jnp.zeros(())
        )
    err_fake = bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
    total = err_real + 0.5 * (err_fake + err_wrong)

    acc = jnp.zeros(())
    if cate_logits_real is not None:
        total = total + 1.0 * multilabel_soft_margin(cate_logits_real, cate_labels)
        acc = multi_label_accuracy(cate_logits_real, cate_labels)

    cons = jnp.zeros(())
    if order_logits is not None:
        cons = bce_with_logits(order_logits.reshape(-1), order_labels.reshape(-1))
        total = total + consistency_ratio * cons

    return DLossOut(total, err_real, err_wrong, err_fake, acc, cons)


class GLossOut(NamedTuple):
    total: jnp.ndarray
    accuracy: jnp.ndarray
    consistency: jnp.ndarray


def generator_loss(
    fake_logits: jnp.ndarray,
    cate_logits_fake: Optional[jnp.ndarray],
    cate_labels: Optional[jnp.ndarray],
    consistency_fake: Optional[jnp.ndarray] = None,
    consistency_real: Optional[jnp.ndarray] = None,
    consistency_ratio: float = 1.0,
) -> GLossOut:
    total = bce_with_logits(fake_logits, jnp.ones_like(fake_logits))
    acc = jnp.zeros(())
    if cate_logits_fake is not None:
        total = total + 1.0 * multilabel_soft_margin(cate_logits_fake, cate_labels)
        acc = multi_label_accuracy(cate_logits_fake, cate_labels)
    cons = jnp.zeros(())
    if consistency_fake is not None:
        cons = jnp.mean(
            jnp.square(consistency_fake - jax.lax.stop_gradient(consistency_real))
        )
        total = total + consistency_ratio * cons
    return GLossOut(total, acc, cons)
