"""dgn_tpu: a TPU-native Directional Graph Network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Saro00/DGN
(Directional Graph Networks, arXiv:2010.02863): Laplacian-eigenvector vector
fields, directional derivative/smoothing aggregators, PNA degree scalers, the
DGN layer family and the five benchmark task models — built on flat padded
GraphBatch structs, masked segment reductions, and jit/pjit sharding instead of
DGL's dynamic mailbox runtime.
"""
from .graph import GraphBatch, GraphData, pack_graphs
from . import nn, spectral
from .ops import aggregators, scalers, segment

__version__ = "0.1.0"
