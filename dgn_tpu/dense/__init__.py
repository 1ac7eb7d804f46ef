"""Dense (B, N, N) execution backend.

Re-designs the reference's dense research path
(/root/reference/models/pytorch/{eigen_agg,aggregators,scalers,dgn_layer}.py)
as batched, static-shape JAX: runtime spectral computation with on-device
connected-component handling, the 15-aggregator dense registry, 5 scalers,
and the dense DGNTower/DGNLayer modules.

This backend is for small fixed-size (padded) graphs — research experiments
and as a numerically convenient oracle; the production path is the flat
segment layout in dgn_tpu.ops / dgn_tpu.layers.
"""
from .spectral import (EPS, laplacian, component_labels, k_lowest_eigvecs,
                       grad_adjacency, eig_adjacency, aggregate_sum,
                       aggregate_eigs)
from .aggregators import AGGREGATORS, aggregate as dense_aggregate
from .scalers import SCALERS, apply_scaler
from .dgn_layer import DenseDGNTower, DenseDGNLayer

__all__ = [
    "EPS", "laplacian", "component_labels", "k_lowest_eigvecs",
    "grad_adjacency", "eig_adjacency", "aggregate_sum", "aggregate_eigs",
    "AGGREGATORS", "dense_aggregate", "SCALERS", "apply_scaler",
    "DenseDGNTower", "DenseDGNLayer",
]
