"""Frame-level training metrics (SURVEY C15).

Transduction-style metrics over binary pianoroll frames, following
Boulanger-Lewandowski et al. 2013 (arXiv:1212.1936 §4): with TP/FP/FN counted
over active notes,

    ACC = TP / (TP + FP + FN)      (the "transduction accuracy")
    P   = TP / (TP + FP),  R = TP / (TP + FN),  F1 = 2PR/(P+R)

All functions take predictions and targets of identical shape (..., D) with
values in {0,1} (predictions may be probabilities — thresholded at 0.5) and
reduce over every axis. Pure jnp — safe inside jit and shard_map (counts are
summed locally; wrap in psum upstream for exact global metrics if needed).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def frame_metrics(pred: jax.Array, target: jax.Array,
                  threshold: float = 0.5,
                  mask: jax.Array = None) -> Dict[str, jax.Array]:
    """``mask``: optional frame-validity weights broadcastable to the inputs
    minus the pitch axis (e.g. (T, B) against (T, B, D)) — padded frames are
    excluded from every count."""
    p = (pred >= threshold).astype(jnp.float32)
    t = (target >= 0.5).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        p = p * m
        t = t * m
        n_cells = jnp.sum(m) * pred.shape[-1]
    else:
        n_cells = jnp.asarray(pred.size, jnp.float32)
    tp = jnp.sum(p * t)
    fp = jnp.sum(p * (1 - t))
    fn = jnp.sum((1 - p) * t)
    eps = 1e-8
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    acc_td = tp / (tp + fp + fn + eps)          # transduction ACC
    if mask is not None:
        agree = jnp.sum((p == t).astype(jnp.float32)
                        * mask.astype(jnp.float32)[..., None])
        exact = agree / jnp.maximum(n_cells, 1.0)
    else:
        exact = jnp.mean((p == t).astype(jnp.float32))
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "acc_transduction": acc_td,
        "acc_elementwise": exact,
    }


def binary_cross_entropy(probs: jax.Array, target: jax.Array,
                         mask: jax.Array = None) -> jax.Array:
    """Mean per-frame BCE (the reference's reconstruction-loss proxy).
    ``mask``: optional frame-validity weights (shape = inputs minus the pitch
    axis) — padded frames are excluded from the mean."""
    eps = 1e-7
    probs = jnp.clip(probs, eps, 1 - eps)
    ce = -(target * jnp.log(probs) + (1 - target) * jnp.log(1 - probs))
    per_frame = jnp.sum(ce, axis=-1)
    if mask is None:
        return jnp.mean(per_frame)
    m = mask.astype(jnp.float32)
    return jnp.sum(per_frame * m) / jnp.maximum(jnp.sum(m), 1.0)
