"""Graph-level readouts over GraphBatch (masked per-graph segment reductions).

Replaces dgl.{mean,sum,max}_nodes (reference
nets/molecules_graph_regression/dgn_net.py:70-86) plus the directional
readouts.  Note: the reference 'directional' readout computes
h * eig1 / sum(|eig1|, dim=1, keepdim=True) where eig1 is the (N,1) column —
that dim=1 sum is a no-op, so the weight reduces to sign(eig1) (and to 1 for
'directional_abs').  We implement sign() directly, which matches the reference
everywhere eig1 != 0 and avoids its 0/0 NaN.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..graph import GraphBatch
from ..ops import segment


def graph_readout(gb: GraphBatch, h: jax.Array, kind: str) -> jax.Array:
    g = gb.num_graphs_padded
    if kind == "sum":
        return segment.segment_sum(h, gb.node_graph, g, gb.node_mask)
    if kind == "max":
        return segment.segment_max(h, gb.node_graph, g, gb.node_mask)
    if kind in ("mean", "default"):
        return segment.segment_mean(h, gb.node_graph, g, gb.node_mask,
                                    gb.n_nodes)
    if kind == "directional":
        sgn = jnp.sign(gb.eig[:, 1:2])
        dir_mean = segment.segment_mean(h * sgn, gb.node_graph, g,
                                        gb.node_mask, gb.n_nodes)
        h_mean = segment.segment_mean(h, gb.node_graph, g, gb.node_mask,
                                      gb.n_nodes)
        return jnp.concatenate([jnp.abs(dir_mean), h_mean], axis=-1)
    if kind == "directional_abs":
        dir_mean = segment.segment_mean(h, gb.node_graph, g, gb.node_mask,
                                        gb.n_nodes)
        h_mean = segment.segment_mean(h, gb.node_graph, g, gb.node_mask,
                                      gb.n_nodes)
        return jnp.concatenate([dir_mean, h_mean], axis=-1)
    # reference falls through to mean for unknown kinds
    return segment.segment_mean(h, gb.node_graph, g, gb.node_mask, gb.n_nodes)
