"""Input feature encoders, including native OGB atom/bond encoders.

The reference imports `ogb.graphproppred.mol_encoder.{AtomEncoder,BondEncoder}`
(reference nets/HIV_graph_classification/dgn_net.py:6) — sums of per-column
categorical embeddings over the standard OGB mol feature columns.  Re-built
natively here (no ogb dependency): one embedding table per column,
xavier-uniform initialized like OGB's, summed.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

# OGB full_atom_feature_dims / full_bond_feature_dims (ogb.utils.features).
ATOM_FEATURE_DIMS: Tuple[int, ...] = (119, 4, 12, 12, 10, 6, 6, 2, 2)
BOND_FEATURE_DIMS: Tuple[int, ...] = (5, 6, 2)


class MultiEmbedding(fnn.Module):
    """Sum of per-column embeddings of an integer feature matrix [N, C].

    Lookups are one-hot matmuls, not jnp.take: on TPU take's backward is a
    per-row scatter-add (~0.65 ms flat regardless of width, ops/mxu.py) —
    with 9 atom + 3 bond tables that was 12 scatters per HIV/PCBA step.  The
    one-hot matmul's backward is itself a matmul (MXU work, zero scatters).
    """
    dims: Tuple[int, ...]
    emb_dim: int

    @fnn.compact
    def __call__(self, x):
        from ..ops.mxu import onehot_embed
        if x.ndim == 1:
            x = x[:, None]
        out = 0.0
        for i, d in enumerate(self.dims):
            table = self.param(f"emb_{i}", fnn.initializers.xavier_uniform(),
                               (d, self.emb_dim))
            out = out + onehot_embed(jnp.clip(x[:, i], 0, d - 1), table)
        return out


class AtomEncoder(fnn.Module):
    emb_dim: int

    @fnn.compact
    def __call__(self, x):
        return MultiEmbedding(ATOM_FEATURE_DIMS, self.emb_dim, name="atom")(x)


class BondEncoder(fnn.Module):
    emb_dim: int

    @fnn.compact
    def __call__(self, x):
        return MultiEmbedding(BOND_FEATURE_DIMS, self.emb_dim, name="bond")(x)
