"""DGN aggregators as fixed-shape edge->node segment reductions.

Reproduces the math of the reference mailbox aggregators
(reference /root/reference/realworld_benchmark/nets/aggregators.py — the set the
published benchmarks ran with, EPS=1e-8) on the flat COO layout of
`GraphBatch`.  For destination node v with incoming edges e=(u->v):

  mean/max/min/std/var/sum : plain reductions of messages msg_e
  dir{k}-av (alias -smooth): sum_e  |d_e| / (S_k(v)+EPS) * msg_e
  dir{k}-dx                : | sum_e w_e*msg_e  -  (sum_e w_e) * h_v |
  dir{k}-dx-no-abs         : same, without the abs
  dir{k}-dx-balanced       : w = (relu(d)/(S+ +EPS) + relu(-d)/(S- +EPS)) / 2
  dir{k}-0.1 / -neg-0.1    : softmax_e(alpha*|d_e|) weighted sum, alpha=+/-0.1

with d_e = eig_u[k] - eig_v[k] and S_k(v) = sum_{e->v} |d_e|
(reference nets/aggregators.py:35-71).  The normalizer S is a per-node
segment-sum shared across all directional aggregators of the same eig index —
computed once here, where the reference recomputes it inside every aggregator.

Everything is mask-correct under padding and shape-static for XLA.
"""
from __future__ import annotations

import re
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from . import segment
from .segment import EPS


class EdgeContext(NamedTuple):
    """Precomputed per-edge/per-node quantities shared by all aggregators."""
    dst: jax.Array          # [E] int32
    edge_mask: jax.Array    # [E] bool
    num_nodes: int
    degree: jax.Array       # [N] true in-degree
    eig_delta: jax.Array    # [E, K] eig_src - eig_dst
    abs_sum: jax.Array      # [N, K] per-dst sum of |delta|
    pos_sum: jax.Array      # [N, K] per-dst sum of relu(delta)
    neg_sum: jax.Array      # [N, K] per-dst sum of relu(-delta)


def build_edge_context(eig: jax.Array, src: jax.Array, dst: jax.Array,
                       edge_mask: jax.Array, degree: jax.Array) -> EdgeContext:
    """Compute the directional-field edge weights' shared ingredients once."""
    n = eig.shape[0]
    eig_s = segment.gather(eig, src)
    eig_d = segment.gather(eig, dst)
    delta = eig_s - eig_d
    abs_sum = segment.segment_sum(jnp.abs(delta), dst, n, edge_mask)
    pos_sum = segment.segment_sum(jax.nn.relu(delta), dst, n, edge_mask)
    neg_sum = segment.segment_sum(jax.nn.relu(-delta), dst, n, edge_mask)
    return EdgeContext(dst=dst, edge_mask=edge_mask, num_nodes=n, degree=degree,
                       eig_delta=delta, abs_sum=abs_sum, pos_sum=pos_sum,
                       neg_sum=neg_sum)


# --------------------------------------------------------------------- plain
def _agg_mean(ctx, msg, h_in):
    return segment.segment_mean(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                ctx.degree)


def _agg_sum(ctx, msg, h_in):
    return segment.segment_sum(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask)


def _agg_max(ctx, msg, h_in):
    return segment.segment_max(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask)


def _agg_min(ctx, msg, h_in):
    return segment.segment_min(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask)


def _agg_var(ctx, msg, h_in):
    return segment.segment_var(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                               ctx.degree)


def _agg_std(ctx, msg, h_in):
    return segment.segment_std(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                               ctx.degree)


# --------------------------------------------------------------- directional
def _dir_av(ctx: EdgeContext, msg, h_in, k: int):
    d = ctx.eig_delta[:, k]
    w = jnp.abs(d) / (ctx.abs_sum[:, k][ctx.dst] + EPS)
    return segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                               ctx.edge_mask)


def _dir_dx(ctx: EdgeContext, msg, h_in, k: int, use_abs: bool):
    d = ctx.eig_delta[:, k]
    w = d / (ctx.abs_sum[:, k][ctx.dst] + EPS)
    wh = segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                             ctx.edge_mask)
    wsum = segment.segment_sum(w, ctx.dst, ctx.num_nodes, ctx.edge_mask)
    out = wh - wsum[:, None] * h_in
    return jnp.abs(out) if use_abs else out


def _dir_dx_balanced(ctx: EdgeContext, msg, h_in, k: int):
    d = ctx.eig_delta[:, k]
    front = jax.nn.relu(d) / (ctx.pos_sum[:, k][ctx.dst] + EPS)
    back = jax.nn.relu(-d) / (ctx.neg_sum[:, k][ctx.dst] + EPS)
    w = (front + back) * 0.5
    wh = segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                             ctx.edge_mask)
    wsum = segment.segment_sum(w, ctx.dst, ctx.num_nodes, ctx.edge_mask)
    return jnp.abs(wh - wsum[:, None] * h_in)


def _dir_softmax(ctx: EdgeContext, msg, h_in, k: int, alpha: float):
    logits = alpha * jnp.abs(ctx.eig_delta[:, k])
    w = segment.segment_softmax(logits, ctx.dst, ctx.num_nodes, ctx.edge_mask)
    return segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                               ctx.edge_mask)


# ----------------------------------------------------------------- registry
_DIR_RE = re.compile(
    r"^dir(?P<k>\d+)-(?P<kind>av|smooth|dx|dx-no-abs|dx-balanced|0\.1|neg-0\.1)$")

_PLAIN = {
    "mean": _agg_mean,
    "sum": _agg_sum,
    "max": _agg_max,
    "min": _agg_min,
    "std": _agg_std,
    "var": _agg_var,
}


def resolve(name: str):
    """Resolve an aggregator name to fn(ctx, msg, h_in) (string-registry UX,
    reference nets/dgn_layer.py:334)."""
    if name in _PLAIN:
        return _PLAIN[name]
    m = _DIR_RE.match(name)
    if not m:
        raise KeyError(f"unknown aggregator {name!r}")
    k = int(m.group("k"))
    kind = m.group("kind")
    if kind in ("av", "smooth"):
        return lambda ctx, msg, h_in: _dir_av(ctx, msg, h_in, k)
    if kind == "dx":
        return lambda ctx, msg, h_in: _dir_dx(ctx, msg, h_in, k, True)
    if kind == "dx-no-abs":
        return lambda ctx, msg, h_in: _dir_dx(ctx, msg, h_in, k, False)
    if kind == "dx-balanced":
        return lambda ctx, msg, h_in: _dir_dx_balanced(ctx, msg, h_in, k)
    if kind == "0.1":
        return lambda ctx, msg, h_in: _dir_softmax(ctx, msg, h_in, k, 0.1)
    if kind == "neg-0.1":
        return lambda ctx, msg, h_in: _dir_softmax(ctx, msg, h_in, k, -0.1)
    raise KeyError(name)


def parse_names(names) -> list[str]:
    """'mean dir1-dx dir1-av' -> ['mean', 'dir1-dx', 'dir1-av'] (validated)."""
    if isinstance(names, str):
        names = names.split()
    names = list(names)
    for n in names:
        resolve(n)
    return names


def max_eig_index(names: Sequence[str]) -> int:
    """Highest eig index any directional aggregator touches (0 if none)."""
    mx = 0
    for n in names:
        m = _DIR_RE.match(n)
        if m:
            mx = max(mx, int(m.group("k")))
    return mx


def aggregate(names: Sequence[str], ctx: EdgeContext, msg: jax.Array,
              h_in: jax.Array) -> jax.Array:
    """Run aggregators and concat on the feature axis -> [N, len(names)*F].

    Mirrors the reference reduce_func concat (reference nets/dgn_layer.py:94).
    """
    outs = [resolve(n)(ctx, msg, h_in) for n in names]
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
