"""Dense scalers over (B, N, D) aggregates with (B, N, N) adjacency.

All five reference scalers (/root/reference/models/pytorch/scalers.py):
identity, amplification log(D+1)/d_log, attenuation d_log/log(D+1),
linear D/d_lin, inverse_linear d_lin/D; D = weighted row degree.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def scale_identity(X, adj, avg_d=None):
    return X


def scale_amplification(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1)
    return X * (jnp.log(D + 1.0) / avg_d["log"])[..., None]


def scale_attenuation(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1)
    return X * (avg_d["log"] / jnp.log(D + 1.0))[..., None]


def scale_linear(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1, keepdims=True)
    return D * X / avg_d["lin"]


def scale_inverse_linear(X, adj, avg_d=None):
    D = jnp.sum(adj, axis=-1, keepdims=True)
    return avg_d["lin"] * X / D


SCALERS: Dict[str, object] = {
    "identity": scale_identity,
    "linear": scale_linear,
    "inverse_linear": scale_inverse_linear,
    "amplification": scale_amplification,
    "attenuation": scale_attenuation,
}


def apply_scaler(name: str, X: jax.Array, adj: jax.Array, avg_d=None):
    return SCALERS[name](X, adj, avg_d)
