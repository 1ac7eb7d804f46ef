"""Dense numpy oracle for the DGN mailbox math, used only by tests.

Implements the aggregator/scaler formulas (transcribed from SURVEY.md §2 #6-7,
which documents /root/reference/realworld_benchmark/nets/aggregators.py and
scalers.py) with an intentionally different structure: explicit per-node
neighbor-list loops over an adjacency built from COO edges.  Slow and simple —
an oracle, not a framework.
"""
import numpy as np

EPS = 1e-8


def incoming(num_nodes, src, dst):
    """neighbors[v] = list of edge indices e with dst[e] == v."""
    out = [[] for _ in range(num_nodes)]
    for e, d in enumerate(dst):
        out[d].append(e)
    return out


def mailbox_aggregate(name, num_nodes, src, dst, msg, eig, h_in):
    """Aggregate edge messages `msg[e]` into nodes, one name at a time.

    eig: [n, K] node eigvec features; h_in: [n, F] destination self features.
    Zero-in-degree nodes produce zeros (DGL update_all zero-fill).
    """
    n, F = num_nodes, msg.shape[1]
    inc = incoming(n, src, dst)
    out = np.zeros((n, F), dtype=np.float64)
    for v in range(n):
        es = inc[v]
        if not es:
            continue
        M = np.stack([msg[e] for e in es])              # [deg, F]
        if name == "mean":
            out[v] = M.mean(0)
        elif name == "sum":
            out[v] = M.sum(0)
        elif name == "max":
            out[v] = M.max(0)
        elif name == "min":
            out[v] = M.min(0)
        elif name == "var":
            out[v] = np.maximum((M * M).mean(0) - M.mean(0) ** 2, 0)
        elif name == "std":
            out[v] = np.sqrt(np.maximum((M * M).mean(0) - M.mean(0) ** 2, 0) + EPS)
        elif name.startswith("dir"):
            body = name[3:]
            k = int(body.split("-")[0])
            kind = body[body.index("-") + 1:]
            delta = np.array([eig[src[e], k] - eig[v, k] for e in es])
            if kind in ("av", "smooth"):
                w = np.abs(delta) / (np.abs(delta).sum() + EPS)
                out[v] = (M * w[:, None]).sum(0)
            elif kind == "dx":
                w = delta / (np.abs(delta).sum() + EPS)
                out[v] = np.abs((M * w[:, None]).sum(0) - w.sum() * h_in[v])
            elif kind == "dx-no-abs":
                w = delta / (np.abs(delta).sum() + EPS)
                out[v] = (M * w[:, None]).sum(0) - w.sum() * h_in[v]
            elif kind == "dx-balanced":
                fr = np.maximum(delta, 0)
                bk = np.maximum(-delta, 0)
                w = (fr / (fr.sum() + EPS) + bk / (bk.sum() + EPS)) / 2
                out[v] = np.abs((M * w[:, None]).sum(0) - w.sum() * h_in[v])
            elif kind in ("0.1", "neg-0.1"):
                alpha = 0.1 if kind == "0.1" else -0.1
                logits = alpha * np.abs(delta)
                ex = np.exp(logits - logits.max())
                w = ex / ex.sum()
                out[v] = (M * w[:, None]).sum(0)
            else:
                raise KeyError(name)
        else:
            raise KeyError(name)
    return out


def scale(name, h, deg, avg_d):
    d = deg.astype(np.float64)
    if name == "identity":
        return h
    if name == "amplification":
        return h * (np.log(d + 1) / avg_d["log"])[:, None]
    if name == "attenuation":
        with np.errstate(divide="ignore"):
            f = np.where(d > 0, avg_d["log"] / np.log(d + 1), 0.0)
        return h * f[:, None]
    if name == "linear":
        return h * (d / avg_d["lin"])[:, None]
    if name == "inverse_linear":
        return h * np.where(d > 0, avg_d["lin"] / np.maximum(d, 1), 0.0)[:, None]
    raise KeyError(name)


def reduce_stage(agg_names, scaler_names, num_nodes, src, dst, msg, eig, h_in,
                 avg_d):
    """Full reduce_func: concat aggregators, then (if >1) concat scalers,
    scaling by the true in-degree."""
    deg = np.zeros(num_nodes)
    for d in dst:
        deg[d] += 1
    h = np.concatenate(
        [mailbox_aggregate(a, num_nodes, src, dst, msg, eig, h_in)
         for a in agg_names], axis=1)
    if len(scaler_names) > 1:
        h = np.concatenate([scale(s, h, deg, avg_d) for s in scaler_names],
                           axis=1)
    return h


def random_graph(rng, n, avg_deg=3):
    """Random connected-ish multigraph in COO (both directions per edge)."""
    edges = set()
    for v in range(1, n):
        u = int(rng.integers(0, v))
        edges.add((u, v))
        edges.add((v, u))
    extra = int(avg_deg * n / 2)
    for _ in range(extra):
        u, v = rng.integers(0, n, 2)
        if u != v:
            edges.add((int(u), int(v)))
            edges.add((int(v), int(u)))
    src, dst = zip(*sorted(edges))
    return np.array(src, dtype=np.int32), np.array(dst, dtype=np.int32)
