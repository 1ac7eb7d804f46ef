"""Task losses, masked for padding.

Reproduces: L1 (reference nets/molecules_graph_regression/dgn_net.py:90-92),
class-weighted CE (SBMs dgn_net.py:67-81), plain CE (superpixels :75-78),
BCE-with-logits (HIV :87-89), NaN-masked 128-task BCE (PCBA dgn_net.py:99-102
+ train_PCBA_graph_classification.py:32-33).  All means are over *real*
elements only (graph_mask / node_mask), which matches the reference exactly
because its batches are never padded.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def l1_loss(scores, targets, mask):
    """nn.L1Loss over real graphs; scores [G,1] or [G], targets same."""
    return _masked_mean(jnp.abs(scores.squeeze(-1) - targets.squeeze(-1)
                                if targets.ndim == scores.ndim else
                                scores.squeeze(-1) - targets), mask)


def cross_entropy(logits, labels, mask):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1).squeeze(-1)
    return _masked_mean(nll, mask)


def weighted_cross_entropy_sbm(logits, labels, mask, n_classes: int):
    """SBM class-balanced CE (reference SBMs dgn_net.py:67-81).

    weight_c = (V - count_c)/V * [count_c > 0]; torch's weighted CE divides by
    the sum of the per-sample weights.
    """
    m = mask.astype(jnp.float32)
    V = jnp.sum(m)
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), n_classes) * m[:, None]
    counts = jnp.sum(onehot, axis=0)
    weight = (V - counts) / jnp.maximum(V, 1.0) * (counts > 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1).squeeze(-1)
    w = weight[labels.astype(jnp.int32)] * m
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def bce_with_logits(scores, labels, mask):
    """Binary cross-entropy with logits, masked mean (HIV)."""
    scores = scores.squeeze(-1) if scores.ndim > labels.ndim else scores
    z = jnp.clip(scores, -60, 60)
    loss = jax.nn.relu(z) - z * labels + jnp.log1p(jnp.exp(-jnp.abs(z)))
    return _masked_mean(loss, mask)


def masked_bce_multitask(scores, labels, graph_mask):
    """PCBA: BCE over 128 tasks, NaN labels excluded
    (is_labeled = labels == labels, reference train_PCBA:32-33)."""
    is_labeled = (labels == labels) & graph_mask[:, None]
    safe = jnp.where(is_labeled, labels, 0.0)
    z = jnp.clip(scores, -60, 60)
    loss = jax.nn.relu(z) - z * safe + jnp.log1p(jnp.exp(-jnp.abs(z)))
    m = is_labeled.astype(loss.dtype)
    return jnp.sum(loss * m) / jnp.maximum(jnp.sum(m), 1.0)
