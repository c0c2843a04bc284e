"""Batched activation extraction over host datasets with a jitted extractor.

Replaces the reference's calculate_activation_statistics loops
(fid/fid_score.py:57-104, fid/vfid_score.py:50-97): fixed batch size,
drop_last=True (reference behavior — trailing samples are ignored so the
statistics match the original FID implementation)."""

from __future__ import annotations

from typing import Callable, Iterable

import jax.numpy as jnp
import numpy as np

from cpcsv_tpu.evaluation.frechet import calculate_activation_statistics


def iter_batches(dataset, batch_size: int, drop_last: bool = True):
    n = len(dataset)
    nb = n // batch_size if drop_last else (n + batch_size - 1) // batch_size
    for b in range(nb):
        items = [dataset[i] for i in range(b * batch_size, min((b + 1) * batch_size, n))]
        yield np.stack(items, axis=0)


def extract_activations(
    dataset, extractor: Callable, batch_size: int, normalize: bool = False
) -> np.ndarray:
    """dataset[i] -> image (H,W,C) or story (T,H,W,C), float.
    normalize: shift [-1,1] -> [0,1] (reference `normalize=True` flag)."""
    feats = []
    for batch in iter_batches(dataset, batch_size, drop_last=True):
        x = batch.astype(np.float32)
        if normalize:
            x = (x + 1.0) / 2.0
        feats.append(np.asarray(extractor(jnp.asarray(x))))
    if not feats:
        raise ValueError("dataset smaller than one batch")
    return np.concatenate(feats, axis=0)


def activation_statistics(
    dataset, extractor, batch_size: int, normalize: bool = False, cache: str | None = None
):
    """mu/sigma with the reference's .npz real-side caching
    (fid/vfid_score.py:157-167).

    The cache file is KEYED BY THE EXTRACTOR'S WEIGHTS FINGERPRINT
    (`extractor.fingerprint`, set by the make_* factories): statistics
    computed with random-init weights can never be reused once real weights
    appear, and vice versa. The fingerprint is also stored inside the npz
    and validated on load (round-1 unkeyed caches are ignored)."""
    import os

    fp = getattr(extractor, "fingerprint", None)
    if cache:
        base = cache[: -len(".npz")] if cache.endswith(".npz") else cache
        cache = f"{base}.{fp}.npz" if fp else base + ".npz"
    if cache and os.path.exists(cache):
        data = np.load(cache, allow_pickle=False)
        stored_fp = str(data["fingerprint"]) if "fingerprint" in data else None
        # exact tag match only: an extractor WITHOUT a fingerprint (custom
        # embedder) reuses only caches written by the same unkeyed path —
        # never a round-1 fp-less npz or a differently-keyed file that
        # happens to sit at the same name
        if stored_fp == (fp or "unkeyed"):
            return data["m1"], data["s1"]
    acts = extract_activations(dataset, extractor, batch_size, normalize)
    mu, sigma = calculate_activation_statistics(acts)
    if cache:
        os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
        np.savez(cache, m1=mu, s1=sigma, fingerprint=np.str_(fp or "unkeyed"))
    return mu, sigma
