"""Graph-level readouts over GraphBatch (masked per-graph segment reductions).

Replaces dgl.{mean,sum,max}_nodes (reference
nets/molecules_graph_regression/dgn_net.py:70-86) plus the directional
readouts.  Note: the reference 'directional' readout computes
h * eig1 / sum(|eig1|, dim=1, keepdim=True) where eig1 is the (N,1) column —
that dim=1 sum is a no-op, so the weight reduces to sign(eig1) (and to 1 for
'directional_abs').  We implement sign() directly, which matches the reference
everywhere eig1 != 0 and avoids its 0/0 NaN.

Edge-partitioned mode (gb.halo set): every shard holds a slice of the node
axis, so per-graph reductions are partial — partials are psum/pmax'd over the
partition axis, making the pooled features (and everything downstream)
replicated across shards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import mxu, segment


def _part_sum(gb: GraphBatch, h: jax.Array) -> jax.Array:
    if gb.mxu is not None and gb.mxu.local_graph is not None:
        s = mxu.graph_pool_sum(h, gb.mxu, gb.num_graphs_padded)
    else:
        # flat masked path — also the edge-partitioned MXU layout, whose
        # shard-contiguous node ranges carry no graph-pooling blocks
        s = segment.segment_sum(h, gb.node_graph, gb.num_graphs_padded,
                                gb.node_mask)
    if gb.halo is not None:
        s = jax.lax.psum(s, gb.halo.axis)
    return s


def _part_mean(gb: GraphBatch, h: jax.Array) -> jax.Array:
    s = _part_sum(gb, h)
    n = gb.n_nodes.astype(s.dtype)[:, None]
    return jnp.where(n > 0, s / jnp.maximum(n, 1), 0)


def _part_max(gb: GraphBatch, h: jax.Array) -> jax.Array:
    data = jnp.where(gb.node_mask[:, None], h, -jnp.inf)
    m = jax.ops.segment_max(data, gb.node_graph, gb.num_graphs_padded,
                            indices_are_sorted=True)
    if gb.halo is not None:
        m = jax.lax.pmax(m, gb.halo.axis)
    return jnp.where(jnp.isfinite(m), m, 0)


def graph_readout(gb: GraphBatch, h: jax.Array, kind: str) -> jax.Array:
    if kind == "sum":
        return _part_sum(gb, h)
    if kind == "max":
        return _part_max(gb, h)
    if kind in ("mean", "default"):
        return _part_mean(gb, h)
    if kind == "directional":
        sgn = jnp.sign(gb.eig[:, 1:2])
        return jnp.concatenate([jnp.abs(_part_mean(gb, h * sgn)),
                                _part_mean(gb, h)], axis=-1)
    if kind == "directional_abs":
        return jnp.concatenate([_part_mean(gb, h), _part_mean(gb, h)],
                               axis=-1)
    # reference falls through to mean for unknown kinds
    return _part_mean(gb, h)
