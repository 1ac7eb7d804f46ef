"""Dense aggregator registry over (B, N, N, D) neighbour tensors.

Capability parity with /root/reference/models/pytorch/aggregators.py (the
15 standard aggregators + the directional registry), re-written as pure
batched JAX over [..., N, N, D] X and [..., N, N] adj, aggregating over the
source axis (-2): out[..., i, d] = reduce_j f(adj[..., i, j], X[..., i, j, d]).

Deviations from the reference, all deliberate:
  * aggregate_softmax in the reference passes `avg_d=None` to torch.sum
    (aggregators.py:121) — a TypeError whenever called; here softmax is
    implemented to its documented semantics with a max-subtracted stable
    exponential.
  * max/min mask non-edges with +-inf then reduce; rows with no edges
    produce 0 here instead of +-inf (padding safety), which only differs on
    degree-0 nodes.
  * `moment_div_stdn` (aggregators.py:141-148, not registered in the
    reference either) is provided for completeness.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .spectral import EPS, aggregate_eigs
from .scalers import scale_amplification, scale_attenuation


def _with_self_loop(adj, self_loop):
    if self_loop:
        adj = adj + jnp.eye(adj.shape[-1], dtype=adj.dtype)
    return adj


def aggregate_identity(X, adj, eigvec=None, self_loop=False, avg_d=None):
    """Main diagonal of X: the node's own (i, i) entry."""
    n = X.shape[-2]
    eye = jnp.eye(n, dtype=X.dtype)[..., None]
    return jnp.sum(X * eye, axis=-2)


def aggregate_sum(X, adj, eigvec=None, self_loop=False, avg_d=None):
    adj = _with_self_loop(adj, self_loop)
    return jnp.sum(X * adj[..., None], axis=-2)


def aggregate_mean(X, adj, eigvec=None, self_loop=False, avg_d=None):
    adj = _with_self_loop(adj, self_loop)
    D = jnp.sum(adj, axis=-1, keepdims=True)
    return jnp.sum(X * adj[..., None], axis=-2) / D


def aggregate_max(X, adj, eigvec=None, self_loop=False, avg_d=None):
    """NOTE: reduces over the -3 axis (reference aggregators.py:42
    `torch.max(M, -3)`), unlike mean/sum which reduce -2 — a reference
    asymmetry kept for parity."""
    adj = _with_self_loop(adj, self_loop)
    M = jnp.where(adj[..., None] > 0, X, -jnp.inf)
    out = jnp.max(M, axis=-3)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def aggregate_min(X, adj, eigvec=None, self_loop=False, avg_d=None):
    adj = _with_self_loop(adj, self_loop)
    M = jnp.where(adj[..., None] > 0, X, jnp.inf)
    out = jnp.min(M, axis=-3)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def aggregate_var(X, adj, eigvec=None, self_loop=False, avg_d=None):
    adj = _with_self_loop(adj, self_loop)
    D = jnp.sum(adj, axis=-1, keepdims=True)
    mean_sq = jnp.sum(X * X * adj[..., None], axis=-2) / D
    mean = jnp.sum(X * adj[..., None], axis=-2) / D
    return jax.nn.relu(mean_sq - mean * mean)


def aggregate_std(X, adj, eigvec=None, self_loop=False, avg_d=None):
    """NOTE: the reference passes its args positionally into aggregate_var
    (aggregators.py:61 `aggregate_var(X, adj, self_loop, device)`), landing
    device='cpu' in the self_loop slot — truthy, so the variance is ALWAYS
    computed with a self-loop added regardless of the flag.  Replicated for
    parity (verified directly against the reference module in
    tests/test_reference_parity.py)."""
    return jnp.sqrt(aggregate_var(X, adj, self_loop=True) + EPS)


def aggregate_normalised_mean(X, adj, eigvec=None, self_loop=False,
                              avg_d=None):
    """D^-1/2 A D^-1/2 X."""
    adj = _with_self_loop(adj, self_loop)
    rD = jnp.sum(adj, axis=-1) ** -0.5
    adj = rD[..., :, None] * adj * rD[..., None, :]
    return jnp.sum(X * adj[..., None], axis=-2)


def aggregate_softmax(X, adj, eigvec=None, self_loop=False, avg_d=None):
    """sum_j softmax_j(X_ij) * X_ij over the neighbourhood (per feature).

    Reduces over the -2 (source j) axis like mean/sum — NOT the -3 axis
    max/min use; that asymmetry is the reference's own (aggregators.py:
    max :42 reduces dim -3, softmax :118-122 reduces dim 2)."""
    adj = _with_self_loop(adj, self_loop)
    a = adj[..., None]
    logits = jnp.where(a > 0, X, -jnp.inf)
    mx = jnp.max(logits, axis=-2, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.exp(X - mx) * a
    denom = jnp.sum(ex, axis=-2, keepdims=True)
    w = ex / jnp.maximum(denom, EPS)
    return jnp.sum(w * X, axis=-2)


def aggregate_softmin(X, adj, eigvec=None, self_loop=False, avg_d=None):
    return -aggregate_softmax(-X, adj, self_loop=self_loop)


def aggregate_moment_rooted(X, adj, eigvec=None, self_loop=False, n=3,
                            avg_d=None):
    """sign(m_n) * (|m_n| + EPS)^(1/n) with m_n the centered n-th moment."""
    adj = _with_self_loop(adj, self_loop)
    D = jnp.sum(adj, axis=-1, keepdims=True)
    mean = aggregate_mean(X, adj)
    m_n = jnp.sum(((X - mean[..., :, None, :]) ** n) * adj[..., None],
                  axis=-2) / D
    # snap float32 cancellation noise to an exact zero: sign(m)(|m|+EPS)^1/n
    # jumps by EPS^(1/n) at m=0, so +-1e-9 noise would flip the output sign
    m_n = jnp.where(jnp.abs(m_n) < 1e-6, 0.0, m_n)
    return jnp.sign(m_n) * (jnp.abs(m_n) + EPS) ** (1.0 / n)


def aggregate_moment_div_stdn(X, adj, eigvec=None, self_loop=False, n=3,
                              avg_d=None):
    """Centered n-th moment / std^n (reference aggregators.py:141-148)."""
    adj = _with_self_loop(adj, self_loop)
    D = jnp.sum(adj, axis=-1, keepdims=True)
    mean = aggregate_mean(X, adj)
    m_n = jnp.sum(((X - mean[..., :, None, :]) ** n) * adj[..., None],
                  axis=-2) / D
    return m_n / (aggregate_std(X, adj) ** n + EPS)


def aggregate_mean_amplified(X, adj, eigvec=None, self_loop=False,
                             avg_d=None):
    """Same positional-arg quirk as aggregate_std: the reference calls
    `aggregate_mean(X, adj, self_loop, device)` (aggregators.py:165), so the
    mean is ALWAYS computed with a self-loop.  Replicated for parity."""
    return scale_amplification(aggregate_mean(X, adj, self_loop=True),
                               adj, avg_d)


def aggregate_mean_attenuated(X, adj, eigvec=None, self_loop=False,
                              avg_d=None):
    """See aggregate_mean_amplified — self-loop always on (reference :171)."""
    return scale_attenuation(aggregate_mean(X, adj, self_loop=True),
                             adj, avg_d)


def _dir(X, adj, eigvec=None, self_loop=False, avg_d=None, *, eig_idx,
         agg_type):
    return aggregate_eigs(X, adj, eig_idx, eigvec=eigvec,
                          normalization="row-abs", add_diag=True,
                          agg_type=agg_type, eig_acos=True,
                          self_loop=self_loop)


def _channels(name: str) -> int:
    """Output channels per input feature (static — replaces the reference's
    runtime dummy-tensor probe, models/pytorch/dgn_layer.py:27-28)."""
    if name == "dir0":
        return 1
    if name.startswith("dir"):
        k, kind = name[3:].split("-")
        return int(k) * (2 if kind == "both" else 1)
    return 1


AGGREGATORS: Dict[str, object] = {
    "mean": aggregate_mean,
    "sum": aggregate_sum,
    "max": aggregate_max,
    "min": aggregate_min,
    "identity": aggregate_identity,
    "std": aggregate_std,
    "var": aggregate_var,
    "normalised_mean": aggregate_normalised_mean,
    "softmax": aggregate_softmax,
    "softmin": aggregate_softmin,
    "moment3": functools.partial(aggregate_moment_rooted, n=3),
    "moment4": functools.partial(aggregate_moment_rooted, n=4),
    "moment5": functools.partial(aggregate_moment_rooted, n=5),
    "mean_amplified": aggregate_mean_amplified,
    "mean_attenuated": aggregate_mean_attenuated,
    "dir0": functools.partial(_dir, eig_idx=[0], agg_type="smoothing"),
}
for _k in range(1, 6):
    _idx = list(range(1, _k + 1))
    AGGREGATORS[f"dir{_k}-dx"] = functools.partial(
        _dir, eig_idx=_idx, agg_type="derivative")
    AGGREGATORS[f"dir{_k}-smooth"] = functools.partial(
        _dir, eig_idx=_idx, agg_type="smoothing")
    AGGREGATORS[f"dir{_k}-both"] = functools.partial(
        _dir, eig_idx=_idx, agg_type="both")


def total_channels(names) -> int:
    return sum(_channels(n) for n in names)


def aggregate(names, X, adj, eigvec: Optional[jax.Array] = None,
              self_loop: bool = False, avg_d=None) -> jax.Array:
    """Concat the named aggregators on the feature axis
    (reference dgn_layer.py:48)."""
    outs = [AGGREGATORS[n](X, adj, eigvec=eigvec, self_loop=self_loop,
                           avg_d=avg_d) for n in names]
    return jnp.concatenate(outs, axis=-1)
