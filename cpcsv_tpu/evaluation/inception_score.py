"""Inception Score (reference `fid/inception_score.py:10-68`):
IS = exp(E_x KL(p(y|x) || p(y))) over `splits` chunks, using InceptionV3
class probabilities. The classifier head is pluggable; without pretrained
weights the score is meaningless but the harness is exercised by tests."""

from __future__ import annotations

import numpy as np


def inception_score_from_probs(probs: np.ndarray, splits: int = 10):
    """probs: (N, num_classes) softmax outputs."""
    N = probs.shape[0]
    if N < splits:
        raise ValueError(
            f"inception score needs at least splits={splits} samples, got {N} "
            "(lower `splits` or provide more images; np.mean over zero chunks "
            "would silently return NaN)"
        )
    scores = []
    for k in range(splits):
        part = probs[k * (N // splits) : (k + 1) * (N // splits)]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score(dataset, classifier, batch_size: int = 32, splits: int = 10,
                    normalize: bool = False):
    """classifier: jitted fn (N,H,W,3)->(N,C) logits.
    normalize: shift [-1,1] images -> the [0,1] the classifier expects
    (same flag as features.extract_activations)."""
    import jax.numpy as jnp
    from cpcsv_tpu.evaluation.features import iter_batches

    probs = []
    for batch in iter_batches(dataset, batch_size, drop_last=False):
        if normalize:
            batch = (batch + 1.0) / 2.0
        logits = np.asarray(classifier(jnp.asarray(batch.astype(np.float32))))
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs.append(e / e.sum(axis=1, keepdims=True))
    return inception_score_from_probs(np.concatenate(probs, axis=0), splits)
