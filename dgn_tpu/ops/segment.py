"""Masked segment reductions — the TPU-native replacement for DGL's mailbox.

The reference aggregates neighbor messages through DGL's degree-bucketed
`update_all` (reference nets/dgn_layer.py:115): nodes are grouped by in-degree
and each bucket reduces a dense mailbox tensor (n_bucket, deg, F).  That layout
forces recompilation per degree multiset and serializes buckets — hostile to
XLA.  Here every reduction is a fixed-shape masked segment op over dst-indexed
edges: `out[v] = reduce_{e: dst[e]=v, mask[e]} data[e]`.

All ops take an explicit `mask` and substitute the reduction identity for pad
edges so padding can never leak into results (min/max identities are +/-inf,
later replaced by 0 for degree-0 nodes to match DGL's zero-fill of message-less
nodes).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# DGL path epsilon (reference nets/aggregators.py:5). The dense torch path used
# 1e-5 (reference models/pytorch/eigen_agg.py:6); we standardize on the value the
# benchmarks actually ran with.
EPS = 1e-8


def _expand_mask(mask: jax.Array, data: jax.Array) -> jax.Array:
    """Broadcast a [E] bool mask against [E, ...] data."""
    return mask.reshape(mask.shape + (1,) * (data.ndim - 1))


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: Optional[jax.Array] = None,
                indices_are_sorted: bool = True) -> jax.Array:
    if mask is not None:
        data = jnp.where(_expand_mask(mask, data), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments,
                               indices_are_sorted=indices_are_sorted)


def segment_mean(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                 mask: Optional[jax.Array] = None,
                 degree: Optional[jax.Array] = None,
                 indices_are_sorted: bool = True) -> jax.Array:
    """Mean over real incoming edges; zero for isolated nodes (DGL zero-fill)."""
    s = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    if degree is None:
        ones = jnp.ones(data.shape[:1], dtype=s.dtype)
        degree = segment_sum(ones, segment_ids, num_segments, mask, indices_are_sorted)
    d = degree.astype(s.dtype).reshape((num_segments,) + (1,) * (s.ndim - 1))
    return jnp.where(d > 0, s / jnp.maximum(d, 1), 0)


def segment_max(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: Optional[jax.Array] = None,
                indices_are_sorted: bool = True) -> jax.Array:
    if mask is not None:
        data = jnp.where(_expand_mask(mask, data), data, -jnp.inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out), out, 0)


def segment_min(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: Optional[jax.Array] = None,
                indices_are_sorted: bool = True) -> jax.Array:
    if mask is not None:
        data = jnp.where(_expand_mask(mask, data), data, jnp.inf)
    out = jax.ops.segment_min(data, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    return jnp.where(jnp.isfinite(out), out, 0)


def segment_extremes(data: jax.Array, segment_ids: jax.Array,
                     num_segments: int, mask: Optional[jax.Array] = None,
                     indices_are_sorted: bool = True):
    """(segment_max, segment_min) in ONE scatter pass.

    XLA:TPU scatters are per-ROW bound, nearly flat in feature width —
    stacking [data, -data] on the feature axis computes both extremes (and
    their backward passes) for the price of one, halving the dominant cost
    of configs that use both aggregators (HIV/PCBA:
    'mean max min dir1-dx dir1-av'; measured 2.6 ms/scatter-pass on the
    168k-edge PCBA batch, v5e).  Tie gradients split equally among argmax
    edges, identical to the separate ops (and to torch scatter_reduce)."""
    d2 = data.reshape(data.shape[0], -1)
    f = d2.shape[1]
    both = jnp.concatenate([d2, -d2], axis=1)
    if mask is not None:
        both = jnp.where(_expand_mask(mask, both), both, -jnp.inf)
    out = jax.ops.segment_max(both, segment_ids, num_segments,
                              indices_are_sorted=indices_are_sorted)
    out = jnp.where(jnp.isfinite(out), out, 0)
    tail = (num_segments,) + data.shape[1:]
    return out[:, :f].reshape(tail), (-out[:, f:]).reshape(tail)


def segment_var(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: Optional[jax.Array] = None,
                degree: Optional[jax.Array] = None,
                indices_are_sorted: bool = True) -> jax.Array:
    """relu(E[x^2] - E[x]^2) over incoming edges (reference nets/aggregators.py:24-28)."""
    m2 = segment_mean(data * data, segment_ids, num_segments, mask, degree,
                      indices_are_sorted)
    m1 = segment_mean(data, segment_ids, num_segments, mask, degree,
                      indices_are_sorted)
    return jax.nn.relu(m2 - m1 * m1)


def segment_std(data: jax.Array, segment_ids: jax.Array, num_segments: int,
                mask: Optional[jax.Array] = None,
                degree: Optional[jax.Array] = None,
                indices_are_sorted: bool = True) -> jax.Array:
    """sqrt(var + EPS) (reference nets/aggregators.py:20-21)."""
    return jnp.sqrt(segment_var(data, segment_ids, num_segments, mask, degree,
                                indices_are_sorted) + EPS)


def segment_softmax(logits: jax.Array, segment_ids: jax.Array, num_segments: int,
                    mask: Optional[jax.Array] = None,
                    indices_are_sorted: bool = True) -> jax.Array:
    """Per-destination softmax over incoming edges (numerically stabilized).

    Equivalent to torch.nn.Softmax(dim=1) over the DGL mailbox axis
    (reference nets/aggregators.py:42-45).
    """
    if mask is not None:
        logits = jnp.where(_expand_mask(mask, logits), logits, -jnp.inf)
    seg_max = jax.ops.segment_max(logits, segment_ids, num_segments,
                                  indices_are_sorted=indices_are_sorted)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    shifted = logits - seg_max[segment_ids]
    ex = jnp.exp(shifted)
    if mask is not None:
        ex = jnp.where(_expand_mask(mask, ex), ex, 0)
    denom = jax.ops.segment_sum(ex, segment_ids, num_segments,
                                indices_are_sorted=indices_are_sorted)
    return ex / jnp.maximum(denom[segment_ids], jnp.finfo(ex.dtype).tiny)


def gather(node_data: jax.Array, indices: jax.Array) -> jax.Array:
    """Edge-parallel gather of node features: node_data[indices]."""
    return jnp.take(node_data, indices, axis=0)
