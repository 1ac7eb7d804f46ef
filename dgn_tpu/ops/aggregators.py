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
  * MXU block layout (ops/mxu.py): because every directional normalizer S is
    constant per destination, normalization commutes with the reduction — so
    mean/sum/var/std and ALL directional families reduce to weighted
    segment-sums with *unnormalized* per-edge weights (1, |d|, d, relu(+-d)),
    computed as one-hot / block-adjacency MXU matmuls whose weight-totals
    columns simultaneously yield S, the in-degree, and the dir-dx centered
    term.  min/max and the softmax family fall back to XLA segment ops.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import segment
from .segment import EPS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeContext:
    """Precomputed per-edge/per-node quantities shared by all aggregators.

    A pytree (it rides inside GraphBatch through jit boundaries — the
    Trainer's eval-context cache attaches a prebuilt one); num_nodes and
    sorted_dst are STATIC metadata because they feed segment-op shapes."""
    dst: jax.Array                    # [E] int32
    edge_mask: jax.Array              # [E] bool
    degree: jax.Array                 # [N] true in-degree
    eig_delta: Optional[jax.Array]    # [E, K] eig_src - eig_dst (None if unused)
    abs_sum: Optional[jax.Array]      # [N, K] per-dst sum of |delta| (XLA path)
    pos_sum: Optional[jax.Array]      # [N, K] per-dst sum of relu(delta)
    neg_sum: Optional[jax.Array]      # [N, K] per-dst sum of relu(-delta)
    num_nodes: int = dataclasses.field(metadata=dict(static=True), default=0)
    # MXU block packing leaves gb.dst non-monotone; flat segment ops must
    # then not claim indices_are_sorted
    sorted_dst: bool = dataclasses.field(metadata=dict(static=True),
                                         default=True)
    # ---- decomposed path (aggregate_decomposed) ----
    # The canonical configs all use a LINEAR pretrans (pretrans_layers=1), so
    # per-edge messages decompose as msg_e = g[src_e] + q[dst_e] (+ c_e) with
    # node-level g, q.  Every directional weight is a function of the eig
    # deltas only, hence BATCH-CONSTANT: the per-edge weight vectors and their
    # per-destination totals are computed ONCE per forward pass here and
    # reused by all L layers.  Keys: "one", "abs{k}", "delta{k}", "pos{k}",
    # "neg{k}", "sm{k}+", "sm{k}-".  Weights are edge-mask-folded.
    src: Optional[jax.Array] = None   # [E] int32 (flat gather of g)
    fam_w: Optional[dict] = None      # {key: [E] float32}
    fam_tot: Optional[dict] = None    # {key: [N] float32} per-dst weight total
    # MXU layouts only: {key: [P, 128, 128]} weighted adjacency blocks
    # (slices of one mxu.build_pair_adjacency stack, in _scatter_keys order so
    # re-stacking in aggregate_decomposed is a no-op); per layer the weighted
    # segment-sums become one batched dense matmul (mxu.pair_adj_matmul)
    fam_adj: Optional[dict] = None


# Route max/min through the scatter-free block reduction (ops/extremes.py)
# on MXU layouts.  TRACE-TIME switch (like mxu.USE_ADJ_KERNEL): flip before
# first trace or clear jit caches when A/B-ing against the joint-scatter pass.
USE_MXU_EXTREMES = True

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


def _scatter_keys(name: str) -> tuple:
    """Weight-family keys whose FULL feature sums `name` consumes."""
    if name in ("mean", "sum", "var", "std"):
        return ("one",)
    if name in ("max", "min"):
        return ()
    k, kind = _dir_spec(name)
    if kind in ("av", "smooth"):
        return (f"abs{k}",)
    if kind in ("dx", "dx-no-abs"):
        return (f"delta{k}",)
    if kind == "dx-balanced":
        return (f"pos{k}", f"neg{k}")
    return (f"sm{k}+" if kind == "0.1" else f"sm{k}-",)


def _total_keys(name: str) -> tuple:
    """Weight-family keys whose per-dst TOTALS `name` consumes."""
    d = _dir_spec(name)
    if d is None:
        return ()
    k, kind = d
    if kind in ("av", "smooth"):
        return (f"abs{k}",)
    if kind in ("dx", "dx-no-abs"):
        return (f"delta{k}", f"abs{k}")
    if kind == "dx-balanced":
        return (f"pos{k}", f"neg{k}")
    return (f"sm{k}+" if kind == "0.1" else f"sm{k}-",)


def _family_weight(key: str, delta, mask, dst, n, sorted_dst):
    """Per-edge weight vector for a family key, edge-mask-folded."""
    maskf = mask.astype(jnp.float32)
    if key == "one":
        return maskf
    if key.startswith("abs"):
        return jnp.abs(delta[:, int(key[3:])]) * maskf
    if key.startswith("delta"):
        return delta[:, int(key[5:])] * maskf
    if key.startswith("pos"):
        return jax.nn.relu(delta[:, int(key[3:])]) * maskf
    if key.startswith("neg"):
        return jax.nn.relu(-delta[:, int(key[3:])]) * maskf
    if key.startswith("sm"):
        k = int(key[2:-1])
        alpha = 0.1 if key.endswith("+") else -0.1
        w = segment.segment_softmax(alpha * jnp.abs(delta[:, k]), dst, n, mask,
                                    indices_are_sorted=sorted_dst)
        return w * maskf
    raise KeyError(key)


def build_edge_context(eig: jax.Array, src: jax.Array, dst: jax.Array,
                       edge_mask: jax.Array, degree: jax.Array,
                       names: Optional[Sequence[str]] = None,
                       need_norms: bool = True,
                       mxu_layout=None,
                       decomposed: bool = False,
                       adj_dtype=None) -> EdgeContext:
    """Shared ingredients.  When `names` is given, skips work no aggregator
    needs; when need_norms=False (fused path), skips the XLA normalizer sums.

    decomposed=True additionally precomputes the per-edge weight vectors and
    their per-destination totals for every family `names` uses — all
    batch-constant (eig-dependent only) so this runs ONCE per forward pass
    and amortizes across the L layers (aggregate_decomposed)."""
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

    fam_w = fam_tot = None
    if decomposed and names is not None:
        keys: list[str] = []
        tot_keys: list[str] = []
        for nm in names:
            for k in _scatter_keys(nm) + _total_keys(nm):
                if k not in keys:
                    keys.append(k)
            for k in _total_keys(nm):
                if k not in tot_keys:
                    tot_keys.append(k)
        fam_w = {k: jax.lax.stop_gradient(
            _family_weight(k, delta, edge_mask, dst, n, sorted_dst))
            for k in keys}
        fam_tot = {}
        # softmax totals are exactly the has-an-edge indicator; "one" = degree
        scat_keys = [k for k in tot_keys if not k.startswith("sm")]
        if scat_keys:
            stacked = jnp.stack([fam_w[k] for k in scat_keys], axis=1)
            if mxu_layout is not None:
                from . import mxu
                tots = mxu.block_scatter_sum(
                    stacked, mxu_layout.local_dst, mxu_layout.edge_chunk_dst,
                    mxu_layout.n_node_blocks)[:n]
            else:
                tots = segment.segment_sum(stacked, dst, n,
                                           indices_are_sorted=sorted_dst)
            for i, k in enumerate(scat_keys):
                fam_tot[k] = jax.lax.stop_gradient(tots[:, i])
        for k in tot_keys:
            if k.startswith("sm"):
                fam_tot[k] = (degree > 0).astype(jnp.float32)

    fam_adj = None
    if fam_w is not None and mxu_layout is not None \
            and getattr(mxu_layout, "chunk_pair", None) is not None:
        # adjacency blocks only for the keys whose FULL feature sums the
        # aggregators consume, in aggregate_decomposed's full_keys order so
        # its stack of these slices folds back into this one array
        adj_keys: list[str] = []
        for nm in names:
            for k in _scatter_keys(nm):
                if k not in adj_keys:
                    adj_keys.append(k)
        if adj_keys:
            from . import mxu
            stack = mxu.build_pair_adjacency(
                jnp.stack([fam_w[k] for k in adj_keys]), mxu_layout,
                out_dtype=adj_dtype)
            stack = jax.lax.stop_gradient(stack)
            fam_adj = {k: stack[:, i] for i, k in enumerate(adj_keys)}
    return EdgeContext(dst=dst, edge_mask=edge_mask, num_nodes=n,
                       degree=degree, eig_delta=delta, abs_sum=abs_sum,
                       pos_sum=pos_sum, neg_sum=neg_sum, sorted_dst=sorted_dst,
                       src=src, fam_w=fam_w, fam_tot=fam_tot, fam_adj=fam_adj)


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


def _fused_aggregate(names, ctx: EdgeContext, msg, h_in, layout,
                     compute_dtype=None):
    """All sum-family aggregators in one fused reduction; returns {name: [N, F]}.

    layout is an ops.mxu.MXULayout: the block-diagonal one-hot-matmul pass
    (zero scatters, fwd+bwd on the MXU).
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

    from . import mxu
    mask = ctx.edge_mask.astype(msg.dtype)
    W = jnp.stack([specs[k] * mask for k in keys])
    sums, totals = mxu.weighted_segment_sums(msg_aug, W, layout,
                                             ctx.num_nodes, n_full=n_full,
                                             compute_dtype=compute_dtype)
    S = {k: (sums[i] if i < n_full else None, totals[i])
         for i, k in enumerate(keys)}

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


def aggregate_decomposed(names: Sequence[str], ctx: EdgeContext,
                         g_node: jax.Array, q_node: Optional[jax.Array],
                         h_in: jax.Array,
                         c_edge: Optional[jax.Array] = None,
                         layout=None, compute_dtype=None) -> jax.Array:
    """All aggregators over linearly-decomposed messages, in ONE scatter pass.

    The canonical DGN configs use a linear pretrans (pretrans_layers=1,
    reference configs/*.json), so per-edge messages factor as

        msg_e = g[src_e] + q[dst_e] (+ c_e)        (q may be None -> 0)

    with node-level g = h@W1 (+bias folded out), q = h@W2 + b, and (edge_feat
    only) c_e = e@W3.  Because every directional weight w_e is a function of
    the eig deltas alone (reference nets/aggregators.py:35-71), each
    aggregator splits into [weighted segment-reductions of g[src] (+c)] plus
    node-local terms with the BATCH-CONSTANT weight totals from EdgeContext:

        sum_e w_e msg_e = S_w[v] + T_w[v] * q[v],   S_w = scatter(w*g), T_w = sum w
        max_e msg_e     = segment_max(g[src]+c) + q[v]
        var_e msg_e     = E[(g+c)^2] - E[g+c]^2     (q shifts cancel)

    So the hot path needs ONE gather of g and ONE wide fused scatter per
    layer — no per-edge MLP, no dst gather, no [E, 2F] concat.  This replaces
    the reference's apply_edges+update_all pipeline
    (reference nets/dgn_layer.py:112-115) with its algebraic normal form.
    Returns the same concat as aggregate().

    Edge-partitioned overlap: g_node may be a (g_own, g_halo) tuple (own-node
    rows and freshly exchanged halo rows, layers/dgn.py EP branch).  With an
    EP layout (n_pairs_int set) the weighted sums split into interior pairs
    (own src blocks — no dependency on the halo all_to_all) plus boundary
    pairs, letting XLA overlap the exchange with interior aggregation.
    """
    names = list(names)
    # Edge-partitioned split: g_node may arrive as (g_own, g_halo) — own rows
    # and FRESHLY EXCHANGED halo rows as separate arrays, so the interior
    # pair matmuls below carry no data dependency on the halo all_to_all and
    # XLA's scheduler can overlap exchange with interior aggregation
    # (SURVEY.md §5 "overlapped with local aggregation").
    g_split = isinstance(g_node, tuple)
    if g_split:
        g_own, g_halo = g_node
        f = g_own.shape[-1]
    else:
        f = g_node.shape[-1]
    from .mxu import MXULayout
    is_mxu = isinstance(layout, MXULayout)
    need_sq = any(n in ("var", "std") for n in names)
    full_keys: list[str] = []
    for nm in names:
        for k in _scatter_keys(nm):
            if k not in full_keys:
                full_keys.append(k)
    # MXU block-adjacency path: all weighted sums as one batched dense
    # [P,K,128,128] x [P,128,F] matmul against the per-forward adjacency
    # blocks.  var/std with edge features can't decompose ((g+c)^2 has a
    # cross term), so that combination keeps the one-hot scatter path.
    use_adj = (is_mxu and ctx.fam_adj is not None
               and all(k in ctx.fam_adj for k in full_keys)
               and (c_edge is None or not need_sq))
    # the split path needs the interior/boundary pair partition and only
    # covers the weighted-sum families; anything else falls back to the
    # concatenated form (correct, just no exchange/compute overlap)
    if g_split and not (use_adj and not need_sq
                        and getattr(layout, "n_pairs_int", None) is not None):
        g_node = jnp.concatenate([g_own, g_halo], axis=0)
        g_split = False
    # the adjacency path needs no per-edge gather of g; ge is only
    # materialized for the scatter paths and for max/min (not expressible
    # as weighted sums)
    need_ge = not use_adj or any(n in ("max", "min") for n in names)

    ge = None
    if need_ge:
        gsrc = jnp.concatenate([g_own, g_halo], axis=0) if g_split else g_node
        if is_mxu:
            from . import mxu
            ge = mxu.gather_src(gsrc, layout, compute_dtype)
        else:
            ge = segment.gather(gsrc, ctx.src)
        if c_edge is not None:
            ge = ge + c_edge

    # ---- one fused scatter/matmul pass for every sum-family aggregator
    S = {}
    if full_keys:
        if use_adj:
            from . import mxu
            nb = layout.n_node_blocks
            # stack of slices folds back into the build_pair_adjacency array
            # (same key order); no re-materialization
            W = jnp.stack([ctx.fam_adj[k] for k in full_keys], axis=1)
            if g_split:
                # interior pairs read own blocks (independent of the halo
                # exchange — schedulable while the all_to_all is in flight);
                # boundary pairs read the freshly pulled halo blocks.  Each
                # group is dst-major, so both segment sums are sorted.
                ni, nbo = layout.n_pairs_int, layout.n_own_blocks
                gp_i = g_own.reshape(nbo, mxu.TILE, f)[layout.pair_src[:ni]]
                t_i = mxu.pair_adj_matmul(W[:ni], gp_i, compute_dtype)
                gp_b = g_halo.reshape(nb - nbo, mxu.TILE, f)[
                    layout.pair_src[ni:] - nbo]
                t_b = mxu.pair_adj_matmul(W[ni:], gp_b, compute_dtype)
                Sb = (jax.ops.segment_sum(t_i, layout.pair_dst[:ni], nb,
                                          indices_are_sorted=True)
                      + jax.ops.segment_sum(t_b, layout.pair_dst[ni:], nb,
                                            indices_are_sorted=True))
            else:
                gp = g_node.reshape(nb, mxu.TILE, f)[layout.pair_src]
                T = mxu.pair_adj_matmul(W, gp, compute_dtype)  # [P,K,t,F]
                # EP layouts order pairs [interior | boundary]: each group
                # is dst-major but their concatenation is NOT sorted
                srt = layout.n_pairs_int is None
                Sb = jax.ops.segment_sum(T, layout.pair_dst, nb,
                                         indices_are_sorted=srt)  # [nb,K,t,F]
            Sb = Sb.transpose(1, 0, 2, 3).reshape(len(full_keys), -1, f)
            for i, k in enumerate(full_keys):
                S[k] = Sb[i][:ctx.num_nodes]
            if need_sq:          # c_edge is None here (see use_adj)
                T2 = mxu.pair_adj_matmul(ctx.fam_adj["one"][:, None],
                                         gp * gp, compute_dtype)
                S2 = jax.ops.segment_sum(
                    T2[:, 0], layout.pair_dst, nb,
                    indices_are_sorted=layout.n_pairs_int is None)
                S["one"] = jnp.concatenate(
                    [S["one"], S2.reshape(-1, f)[:ctx.num_nodes]], axis=1)
            if c_edge is not None:
                cols = [c_edge * ctx.fam_w[k][:, None] for k in full_keys]
                wide = jnp.concatenate(cols, axis=1) if len(cols) > 1 \
                    else cols[0]
                sc = mxu.block_scatter_sum(
                    wide, layout.local_dst, layout.edge_chunk_dst, nb,
                    compute_dtype=compute_dtype)[:ctx.num_nodes]
                for i, k in enumerate(full_keys):
                    S[k] = S[k] + sc[:, i * f:(i + 1) * f]
        else:
            from . import mxu
            cols, bounds, off = [], {}, 0
            for k in full_keys:
                d = (jnp.concatenate([ge, ge * ge], axis=1)
                     if (k == "one" and need_sq) else ge)
                cols.append(d * ctx.fam_w[k][:, None])
                bounds[k] = (off, off + d.shape[1])
                off += d.shape[1]
            wide = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
            if is_mxu:
                out = mxu.block_scatter_sum(
                    wide, layout.local_dst, layout.edge_chunk_dst,
                    layout.n_node_blocks,
                    compute_dtype=compute_dtype)[:ctx.num_nodes]
            else:
                out = segment.segment_sum(wide, ctx.dst, ctx.num_nodes,
                                          indices_are_sorted=ctx.sorted_dst)
            for k in full_keys:
                a, b = bounds[k]
                S[k] = out[:, a:b]

    deg = ctx.degree.astype((g_own if g_split else g_node).dtype)
    degc = jnp.maximum(deg, 1.0)[:, None]
    has_edge = (deg > 0)[:, None]
    q = q_node

    # extremes: under the MXU layout, the scatter-free block reduction
    # (ops/extremes.py — segmented max-scan + one-hot routing matmuls, equal
    # tie-split backward); flat layout keeps the joint [ge, -ge] scatter pass
    # (segment.segment_extremes docstring has the measurements)
    ext = None
    if ("max" in names or "min" in names) and is_mxu and USE_MXU_EXTREMES:
        from . import extremes as ext_ops
        ext = ext_ops.mxu_segment_extremes(ge, layout, ctx.edge_mask,
                                           ctx.num_nodes)
    elif "max" in names and "min" in names:
        ext = segment.segment_extremes(ge, ctx.dst, ctx.num_nodes,
                                       ctx.edge_mask,
                                       indices_are_sorted=ctx.sorted_dst)

    outs = []
    for name in names:
        if name == "sum":
            s = S["one"][:, :f]
            outs.append(s + deg[:, None] * q if q is not None else s)
        elif name == "mean":
            s = S["one"][:, :f] / degc
            val = s + q if q is not None else s
            outs.append(jnp.where(has_edge, val, 0.0))
        elif name in ("var", "std"):
            m1 = jnp.where(has_edge, S["one"][:, :f] / degc, 0.0)
            m2 = jnp.where(has_edge, S["one"][:, f:2 * f] / degc, 0.0)
            var = jax.nn.relu(m2 - m1 * m1)
            outs.append(var if name == "var" else jnp.sqrt(var + EPS))
        elif name in ("max", "min"):
            if ext is not None:
                s = ext[0] if name == "max" else ext[1]
            else:
                op = (segment.segment_max if name == "max"
                      else segment.segment_min)
                s = op(ge, ctx.dst, ctx.num_nodes, ctx.edge_mask,
                       indices_are_sorted=ctx.sorted_dst)
            val = s + q if q is not None else s
            outs.append(jnp.where(has_edge, val, 0.0))
        else:
            k, kind = _dir_spec(name)
            if kind in ("av", "smooth"):
                key = f"abs{k}"
                tot = ctx.fam_tot[key][:, None]
                s = S[key][:, :f]
                if q is not None:
                    s = s + tot * q
                outs.append(s / (tot + EPS))
            elif kind in ("dx", "dx-no-abs"):
                key = f"delta{k}"
                t = ctx.fam_tot[key][:, None]
                norm = ctx.fam_tot[f"abs{k}"][:, None]
                s = S[key][:, :f] - t * h_in
                if q is not None:
                    s = s + t * q
                val = s / (norm + EPS)
                outs.append(jnp.abs(val) if kind == "dx" else val)
            elif kind == "dx-balanced":
                tp = ctx.fam_tot[f"pos{k}"][:, None]
                tn = ctx.fam_tot[f"neg{k}"][:, None]
                sp = S[f"pos{k}"][:, :f] - tp * h_in
                sn = S[f"neg{k}"][:, :f] - tn * h_in
                if q is not None:
                    sp = sp + tp * q
                    sn = sn + tn * q
                outs.append(jnp.abs(0.5 * (sp / (tp + EPS) + sn / (tn + EPS))))
            else:       # softmax family: weights sum to 1[deg>0]
                key = f"sm{k}+" if kind == "0.1" else f"sm{k}-"
                s = S[key][:, :f]
                if q is not None:
                    s = s + ctx.fam_tot[key][:, None] * q
                outs.append(s)
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def aggregate(names: Sequence[str], ctx: EdgeContext, msg: jax.Array,
              h_in: jax.Array, layout=None,
              compute_dtype=None) -> jax.Array:
    """Run aggregators and concat on the feature axis -> [N, len(names)*F].

    Mirrors the reference reduce_func concat (reference nets/dgn_layer.py:94).
    With an MXULayout, sum-family aggregators run the fused one-hot-matmul
    pass; others use XLA segment ops.
    """
    names = list(names)
    fused = {}
    if layout is not None:
        fuse_names = [n for n in names if _fusable(n)]
        if fuse_names:
            fused = _fused_aggregate(fuse_names, ctx, msg, h_in, layout,
                                     compute_dtype)
        if ("max" in names or "min" in names) and USE_MXU_EXTREMES:
            from . import extremes as ext_ops
            mx, mn = ext_ops.mxu_segment_extremes(msg, layout, ctx.edge_mask,
                                                  ctx.num_nodes)
            fused["max"], fused["min"] = mx, mn
    outs = [fused[n] if n in fused else _agg_xla(n, ctx, msg, h_in)
            for n in names]
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def resolve(name: str):
    """Single-aggregator accessor (kept for tests/tools)."""
    parse_names([name])
    return lambda ctx, msg, h_in: _agg_xla(name, ctx, msg, h_in)
