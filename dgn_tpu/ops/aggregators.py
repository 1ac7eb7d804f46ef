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
(reference nets/aggregators.py:35-71).

Two execution paths share these formulas:
  * XLA: one masked segment op per aggregator (always available).
  * Pallas fused (ops/pallas/segment_kernels.py): because every directional
    normalizer S is constant per destination, normalization commutes with the
    reduction — so mean/sum/var/std and ALL directional families reduce to
    weighted segment-sums with *unnormalized* per-edge weights (1, |d|, d,
    relu(+-d)), computed in a single kernel pass whose weight-totals column
    simultaneously yields S, the in-degree, and the dir-dx centered term.
    min/max and the softmax family fall back to XLA.
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
    dst: jax.Array                    # [E] int32
    edge_mask: jax.Array              # [E] bool
    num_nodes: int
    degree: jax.Array                 # [N] true in-degree
    eig_delta: Optional[jax.Array]    # [E, K] eig_src - eig_dst (None if unused)
    abs_sum: Optional[jax.Array]      # [N, K] per-dst sum of |delta| (XLA path)
    pos_sum: Optional[jax.Array]      # [N, K] per-dst sum of relu(delta)
    neg_sum: Optional[jax.Array]      # [N, K] per-dst sum of relu(-delta)
    # MXU block packing leaves gb.dst non-monotone; flat segment ops must
    # then not claim indices_are_sorted
    sorted_dst: bool = True


_DIR_RE = re.compile(
    r"^dir(?P<k>\d+)-(?P<kind>av|smooth|dx|dx-no-abs|dx-balanced|0\.1|neg-0\.1)$")

_PLAIN = ("mean", "sum", "max", "min", "std", "var")

# names the fused kernel can express as weighted segment-sums
_FUSABLE_PLAIN = ("mean", "sum", "std", "var")
_FUSABLE_DIR = ("av", "smooth", "dx", "dx-no-abs", "dx-balanced")


def parse_names(names) -> list[str]:
    """'mean dir1-dx dir1-av' -> validated list (string-registry UX,
    reference nets/dgn_layer.py:334)."""
    if isinstance(names, str):
        names = names.split()
    names = list(names)
    for n in names:
        if n not in _PLAIN and not _DIR_RE.match(n):
            raise KeyError(f"unknown aggregator {n!r}")
    return names


def _dir_spec(name):
    m = _DIR_RE.match(name)
    if not m:
        return None
    return int(m.group("k")), m.group("kind")


def max_eig_index(names: Sequence[str]) -> int:
    mx = 0
    for n in names:
        d = _dir_spec(n)
        if d:
            mx = max(mx, d[0])
    return mx


def build_edge_context(eig: jax.Array, src: jax.Array, dst: jax.Array,
                       edge_mask: jax.Array, degree: jax.Array,
                       names: Optional[Sequence[str]] = None,
                       need_norms: bool = True,
                       mxu_layout=None) -> EdgeContext:
    """Shared ingredients.  When `names` is given, skips work no aggregator
    needs; when need_norms=False (fused path), skips the XLA normalizer sums."""
    n = eig.shape[0]
    sorted_dst = mxu_layout is None
    any_dir = names is None or any(_dir_spec(x) for x in names)
    delta = abs_sum = pos_sum = neg_sum = None
    if any_dir:
        # Always a plain XLA row gather, even under the MXU block layout: eig
        # is input data (no gradient flows through it), so the one-hot-matmul
        # machinery — whose whole point is a scatter-free backward — buys
        # nothing here, and the context is built once per forward pass
        # (models/dgn_net.py), not per layer.
        delta = segment.gather(eig, src) - segment.gather(eig, dst)
        delta = jax.lax.stop_gradient(delta)
        if need_norms:
            kinds = ({k for _, k in filter(None, map(_dir_spec, names))}
                     if names is not None else {"dx"})
            if kinds - {"dx-balanced"}:
                abs_sum = segment.segment_sum(jnp.abs(delta), dst, n, edge_mask,
                                              indices_are_sorted=sorted_dst)
            if "dx-balanced" in kinds or names is None:
                pos_sum = segment.segment_sum(jax.nn.relu(delta), dst, n,
                                              edge_mask,
                                              indices_are_sorted=sorted_dst)
                neg_sum = segment.segment_sum(jax.nn.relu(-delta), dst, n,
                                              edge_mask,
                                              indices_are_sorted=sorted_dst)
    return EdgeContext(dst=dst, edge_mask=edge_mask, num_nodes=n,
                       degree=degree, eig_delta=delta, abs_sum=abs_sum,
                       pos_sum=pos_sum, neg_sum=neg_sum, sorted_dst=sorted_dst)


# ===================================================================== XLA

def _agg_xla(name: str, ctx: EdgeContext, msg, h_in):
    s = ctx.sorted_dst
    if name == "mean":
        return segment.segment_mean(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                    ctx.degree, indices_are_sorted=s)
    if name == "sum":
        return segment.segment_sum(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   indices_are_sorted=s)
    if name == "max":
        return segment.segment_max(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   indices_are_sorted=s)
    if name == "min":
        return segment.segment_min(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   indices_are_sorted=s)
    if name == "var":
        return segment.segment_var(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   ctx.degree, indices_are_sorted=s)
    if name == "std":
        return segment.segment_std(msg, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   ctx.degree, indices_are_sorted=s)
    k, kind = _dir_spec(name)
    d = ctx.eig_delta[:, k]
    if kind in ("av", "smooth"):
        w = jnp.abs(d) / (ctx.abs_sum[:, k][ctx.dst] + EPS)
        return segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                                   ctx.edge_mask, indices_are_sorted=s)
    if kind in ("dx", "dx-no-abs"):
        w = d / (ctx.abs_sum[:, k][ctx.dst] + EPS)
        wh = segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                                 ctx.edge_mask, indices_are_sorted=s)
        wsum = segment.segment_sum(w, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   indices_are_sorted=s)
        out = wh - wsum[:, None] * h_in
        return jnp.abs(out) if kind == "dx" else out
    if kind == "dx-balanced":
        front = jax.nn.relu(d) / (ctx.pos_sum[:, k][ctx.dst] + EPS)
        back = jax.nn.relu(-d) / (ctx.neg_sum[:, k][ctx.dst] + EPS)
        w = (front + back) * 0.5
        wh = segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                                 ctx.edge_mask, indices_are_sorted=s)
        wsum = segment.segment_sum(w, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                   indices_are_sorted=s)
        return jnp.abs(wh - wsum[:, None] * h_in)
    # softmax family
    alpha = 0.1 if kind == "0.1" else -0.1
    logits = alpha * jnp.abs(d)
    w = segment.segment_softmax(logits, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                                indices_are_sorted=s)
    return segment.segment_sum(msg * w[:, None], ctx.dst, ctx.num_nodes,
                               ctx.edge_mask, indices_are_sorted=s)


# ================================================================ fused path

def _fusable(name: str) -> bool:
    if name in _FUSABLE_PLAIN:
        return True
    d = _dir_spec(name)
    return d is not None and d[1] in _FUSABLE_DIR


def _fused_aggregate(names, ctx: EdgeContext, msg, h_in, layout, interpret,
                     compute_dtype=None):
    """All sum-family aggregators in one fused reduction; returns {name: [N, F]}.

    Backend depends on the layout type: an ops.mxu.MXULayout runs the
    block-diagonal one-hot-matmul pass (zero scatters, fwd+bwd on the MXU);
    a Pallas BlockLayout runs the chunked kernel.
    """
    f = msg.shape[1]
    need_sq = any(n in ("var", "std") for n in names)
    specs = {}          # row key -> weight vector [E]
    full = {}           # row key -> needs the full feature sums (not just S)

    def want(key, vec, need_full):
        if key not in specs:
            specs[key] = vec
            full[key] = need_full
        else:
            full[key] = full[key] or need_full

    for name in names:
        if name in ("mean", "sum", "var", "std"):
            want(("one",), jnp.ones_like(msg[:, 0]), True)
        else:
            k, kind = _dir_spec(name)
            d = ctx.eig_delta[:, k]
            if kind in ("av", "smooth"):
                want(("abs", k), jnp.abs(d), True)
            elif kind in ("dx", "dx-no-abs"):
                want(("delta", k), d, True)
                want(("abs", k), jnp.abs(d), False)   # normalizer S_k only
            elif kind == "dx-balanced":
                want(("pos", k), jax.nn.relu(d), True)
                want(("neg", k), jax.nn.relu(-d), True)

    # full-sum keys first so the backend can emit totals-only for the rest
    keys = sorted(specs, key=lambda k: not full[k])
    n_full = sum(1 for k in keys if full[k])
    msg_aug = jnp.concatenate([msg, msg * msg], axis=1) if need_sq else msg

    from .mxu import MXULayout
    if isinstance(layout, MXULayout):
        from . import mxu
        mask = ctx.edge_mask.astype(msg.dtype)
        W = jnp.stack([specs[k] * mask for k in keys])
        sums, totals = mxu.weighted_segment_sums(msg_aug, W, layout,
                                                 ctx.num_nodes, n_full=n_full,
                                                 compute_dtype=compute_dtype)
        S = {k: (sums[i] if i < n_full else None, totals[i])
             for i, k in enumerate(keys)}
    else:
        from .pallas import segment_kernels as sk
        W = jnp.stack([specs[k] for k in keys])
        sums, totals = sk.weighted_segment_sums(msg_aug, W, layout,
                                                ctx.num_nodes,
                                                interpret=interpret)
        S = {k: (sums[i], totals[i]) for i, k in enumerate(keys)}

    deg = ctx.degree.astype(msg.dtype)
    degc = jnp.maximum(deg, 1.0)[:, None]
    out = {}
    for name in names:
        if name == "sum":
            out[name] = S[("one",)][0][:, :f]
        elif name in ("mean", "var", "std"):
            s1 = S[("one",)][0][:, :f] / degc
            s1 = jnp.where(deg[:, None] > 0, s1, 0.0)
            if name == "mean":
                out[name] = s1
            else:
                s2 = S[("one",)][0][:, f:2 * f] / degc
                s2 = jnp.where(deg[:, None] > 0, s2, 0.0)
                var = jax.nn.relu(s2 - s1 * s1)
                out[name] = var if name == "var" else jnp.sqrt(var + EPS)
        else:
            k, kind = _dir_spec(name)
            if kind in ("av", "smooth"):
                s, tot = S[("abs", k)]
                out[name] = s[:, :f] / (tot[:, None] + EPS)
            elif kind in ("dx", "dx-no-abs"):
                s, tot = S[("delta", k)]
                norm = S[("abs", k)][1]
                val = (s[:, :f] - tot[:, None] * h_in) / (norm[:, None] + EPS)
                out[name] = jnp.abs(val) if kind == "dx" else val
            else:  # dx-balanced
                sp, tp = S[("pos", k)]
                sn, tn = S[("neg", k)]
                val = 0.5 * ((sp[:, :f] - tp[:, None] * h_in) / (tp[:, None] + EPS)
                             + (sn[:, :f] - tn[:, None] * h_in) / (tn[:, None] + EPS))
                out[name] = jnp.abs(val)
    return out


def aggregate(names: Sequence[str], ctx: EdgeContext, msg: jax.Array,
              h_in: jax.Array, layout=None,
              interpret: Optional[bool] = None,
              compute_dtype=None) -> jax.Array:
    """Run aggregators and concat on the feature axis -> [N, len(names)*F].

    Mirrors the reference reduce_func concat (reference nets/dgn_layer.py:94).
    With a BlockLayout, sum-family aggregators run through the fused Pallas
    kernel; others use XLA segment ops.
    """
    names = list(names)
    fused = {}
    if layout is not None:
        from .mxu import MXULayout
        if interpret is None and not isinstance(layout, MXULayout):
            interpret = jax.default_backend() == "cpu"
        fuse_names = [n for n in names if _fusable(n)]
        if fuse_names:
            fused = _fused_aggregate(fuse_names, ctx, msg, h_in, layout,
                                     interpret, compute_dtype)
    outs = [fused[n] if n in fused else _agg_xla(n, ctx, msg, h_in)
            for n in names]
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def resolve(name: str):
    """Single-aggregator accessor (kept for tests/tools)."""
    parse_names([name])
    return lambda ctx, msg, h_in: _agg_xla(name, ctx, msg, h_in)
