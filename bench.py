"""Benchmark: DGN-complex ZINC training throughput (edges/s/chip) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline = TPU edges/s divided by a torch-CPU reference implementation of
the same model (the reference stack is torch+DGL on CPU/GPU; DGL is not
installed here, so the baseline is a faithful torch re-implementation of the
reference DGNLayerComplex math using index_add scatter ops — the same
computational graph the reference executes).

Timing method: the axon TPU tunnel makes `block_until_ready` return before
remote execution finishes, so K train steps are wrapped in ONE jit via
lax.scan, reduced to a scalar on device, and fetched with float().  Each jit
dispatch through the tunnel additionally carries a ~25 ms FIXED overhead
(measured: the same scan at 8/32/128/512 steps fits total = 25 ms + K * step),
so the per-step cost is the SLOPE of a two-point fit — scan(K_hi) minus
scan(K_lo) over (K_hi - K_lo) — not total/K.  Layouts timed side by side:

  flat        — flat COO + XLA segment scatter/gather ops
  pallas      — flat + fused Pallas weighted-segment-sum kernel
  mxu         — block-diagonal 128-node packing; gathers/scatters are one-hot
                MXU matmuls (ops/mxu.py), f32
  mxu_bf16    — same with bfloat16 matmul inputs (f32 accumulation)
  mxu_legacy  — mxu with the linear-pretrans decomposition disabled
                (per-edge message pipeline; what rounds 1-2 shipped)

All but mxu_legacy run the decomposed edge stage
(ops/aggregators.py:aggregate_decomposed): one gather + one fused wide
scatter per layer, directional weights/totals hoisted to batch constants.
The headline value is the layout run.py ships by default (resolve_layout).
MFU is estimated from XLA's compiled flop count against the v5e bf16 peak.

Workload: synthetic ZINC-shaped molecules (9..37 atoms), batch of 1024 graphs,
DGN complex L=4 hidden=45, aggregators "mean dir1-dx dir1-av", scalers
"identity amplification attenuation" — the headline ZINC config
(reference configs/molecules_graph_regression_DGN_ZINC.json).
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

BATCH = 1024
STEPS_LO = 16                   # two-point fit: slope removes the fixed
STEPS_HI = 144                  # ~25 ms per-dispatch tunnel overhead
HIDDEN = 45
L = 4
TORCH_STEPS = 6
V5E_BF16_PEAK = 197e12          # FLOP/s, one v5e chip


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_graphs():
    from dgn_tpu.data import synthetic
    from dgn_tpu.ops.scalers import degree_stats

    graphs = synthetic.synthetic_zinc(BATCH, seed=41)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    avg_d = degree_stats(degs)
    real_edges = sum(g.num_edges for g in graphs)
    return graphs, avg_d, real_edges


def pack(graphs, layout):
    from dgn_tpu.graph import (bucket_sizes_for, mxu_bucket_sizes,
                               pack_graphs, round_up)

    if layout.startswith("mxu"):
        n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, BATCH)
        return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                           mxu_layout=True)
    n_pad, e_pad = bucket_sizes_for(graphs, BATCH)
    return pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=BATCH,
                       kernel_layout=(layout == "pallas"))


def time_layout(layout, graphs, avg_d, real_edges):
    """Compile + time train steps inside one jit (scan) at two step counts;
    the per-step cost is the slope (fixed dispatch overhead cancels).
    Returns (edges_per_s, step_ms, mfu or None)."""
    import jax
    import jax.numpy as jnp

    from dgn_tpu.models import DGNConfig, zinc_model
    from dgn_tpu.train.trainer import TrainParams, Trainer

    gb = pack(graphs, "mxu" if layout == "mxu_legacy" else layout)
    cfg = DGNConfig(hidden_dim=HIDDEN, out_dim=HIDDEN, L=L,
                    type_net="complex",
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation",
                    avg_d=avg_d,
                    compute_dtype="bfloat16" if layout.endswith("bf16")
                    else None,
                    decompose=layout != "mxu_legacy")
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(seed=41, init_lr=1e-3, weight_decay=3e-6)
    trainer = Trainer(model, loss_fn, params, task="zinc", donate=False)
    state = trainer.init_state(gb)
    lr = jnp.asarray(1e-3, jnp.float32)

    def body(carry, _):
        st, rng = carry
        rng, sub = jax.random.split(rng)
        st, loss, _ = trainer._train_step_impl(st, gb, sub, lr)
        return (st, rng), loss

    @partial(jax.jit, static_argnums=(2,))
    def run(st, rng, n):
        (st, _), losses = jax.lax.scan(body, (st, rng), None, length=n)
        # keep the final update live + reduce to one scalar for the fetch
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return losses.sum() + 0.0 * leaf.reshape(-1)[0]

    rng = jax.random.PRNGKey(0)

    def total(n):
        probe = float(run(state, rng, n))        # compile on first call
        assert np.isfinite(probe), (layout, n, probe)
        best = np.inf
        # min over 3 reps: transient tunnel hiccups only ever ADD time, and
        # an inflated short-scan point would otherwise shrink the slope and
        # OVER-report throughput
        for _ in range(3):
            t0 = time.perf_counter()
            probe = float(run(state, rng, n))    # scalar fetch = device sync
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(probe), (layout, n, probe)
        return best

    t_lo, t_hi = total(STEPS_LO), total(STEPS_HI)
    step_s = max((t_hi - t_lo) / (STEPS_HI - STEPS_LO), 1e-9)

    mfu = None
    try:
        ca = run.lower(state, rng, STEPS_HI).compile().cost_analysis()
        if ca and ca.get("flops"):
            mfu = float(ca["flops"]) / STEPS_HI / step_s / V5E_BF16_PEAK
    except Exception:
        pass
    return real_edges / step_s, step_s * 1e3, mfu


def bench_pattern():
    """SBM-PATTERN-shaped train step, mxu layout — graphs wider than one
    128-node block, so the edge stage runs cross-block adjacency pairs
    (the path ZINC molecules never touch).  Returns (edges_per_s, step_ms)."""
    import jax
    import jax.numpy as jnp

    from dgn_tpu.data import synthetic
    from dgn_tpu.graph import mxu_bucket_sizes, pack_graphs
    from dgn_tpu.models import DGNConfig, sbm_model
    from dgn_tpu.ops.scalers import degree_stats
    from dgn_tpu.train.trainer import TrainParams, Trainer

    n_graphs = 128
    graphs = synthetic.synthetic_sbm(n_graphs, seed=41, nodes=117)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    real_edges = sum(g.num_edges for g in graphs)
    n_pad, e_pad, g_pad = mxu_bucket_sizes(graphs, n_graphs)
    gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                     mxu_layout=True)
    # canonical PATTERN net (configs/SBMs_node_clustering_DGN_PATTERN.json)
    cfg = DGNConfig(hidden_dim=47, out_dim=47, L=4, type_net="complex",
                    aggregators="mean dir1-dx dir2-dx",
                    scalers="identity amplification attenuation",
                    avg_d=degree_stats(degs), n_out=2)
    model, loss_fn = sbm_model(cfg, n_classes=2)
    trainer = Trainer(model, loss_fn, TrainParams(seed=41, init_lr=1e-3),
                      task="sbm", donate=False)
    state = trainer.init_state(gb)
    lr = jnp.asarray(1e-3, jnp.float32)

    def body(carry, _):
        st, rng = carry
        rng, sub = jax.random.split(rng)
        st, loss, _ = trainer._train_step_impl(st, gb, sub, lr)
        return (st, rng), loss

    @partial(jax.jit, static_argnums=(2,))
    def run(st, rng, n):
        (st, _), losses = jax.lax.scan(body, (st, rng), None, length=n)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return losses.sum() + 0.0 * leaf.reshape(-1)[0]

    rng = jax.random.PRNGKey(0)

    def total(n):
        assert np.isfinite(float(run(state, rng, n)))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(state, rng, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = total(STEPS_LO, ), total(STEPS_HI)
    step_s = max((t_hi - t_lo) / (STEPS_HI - STEPS_LO), 1e-9)
    return real_edges / step_s, step_s * 1e3


def bench_torch_cpu(graphs, avg_d, real_edges):
    """torch-CPU DGN-complex train step — the reference's computational graph."""
    import torch
    import torch.nn as nn
    torch.set_num_threads(max(1, torch.get_num_threads()))

    # one big batched graph, reference-style concatenation
    srcs, dsts, feats = [], [], []
    off = 0
    eigs, snorms, gids = [], [], []
    for i, g in enumerate(graphs):
        srcs.append(np.asarray(g.src) + off)
        dsts.append(np.asarray(g.dst) + off)
        feats.append(g.node_feat)
        eigs.append(g.eig)
        snorms.append(np.full((g.num_nodes, 1), np.sqrt(1.0 / g.num_nodes),
                              np.float32))
        gids.append(np.full((g.num_nodes,), i, np.int64))
        off += g.num_nodes
    src = torch.from_numpy(np.concatenate(srcs)).long()
    dst = torch.from_numpy(np.concatenate(dsts)).long()
    x = torch.from_numpy(np.concatenate(feats)).long()
    eig = torch.from_numpy(np.concatenate(eigs))
    snorm = torch.from_numpy(np.concatenate(snorms))
    gid = torch.from_numpy(np.concatenate(gids))
    n = off
    n_graphs = len(graphs)
    deg = torch.zeros(n).index_add_(0, dst, torch.ones(len(dst)))
    targets = torch.randn(n_graphs, 1)

    H = HIDDEN
    EPS = 1e-8

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.pre = nn.Linear(2 * H, H)
            self.post = nn.Linear(10 * H, H)  # (1 + 3*3)*H in
            self.bn = nn.BatchNorm1d(H)

        def forward(self, h):
            msg = self.pre(torch.cat([h[src], h[dst]], dim=1))
            outs = []
            # mean
            agg = torch.zeros(n, H).index_add_(0, dst, msg) / deg.clamp(1)[:, None]
            outs.append(agg)
            # dir1-dx / dir1-av
            delta = eig[src, 1] - eig[dst, 1]
            absum = torch.zeros(n).index_add_(0, dst, delta.abs())
            w = delta / (absum[dst] + EPS)
            wh = torch.zeros(n, H).index_add_(0, dst, msg * w[:, None])
            wsum = torch.zeros(n).index_add_(0, dst, w)
            outs.append((wh - wsum[:, None] * h).abs())
            wa = delta.abs() / (absum[dst] + EPS)
            outs.append(torch.zeros(n, H).index_add_(0, dst, msg * wa[:, None]))
            cat = torch.cat(outs, dim=1)
            logd = torch.log(deg + 1)
            scaled = torch.cat([cat, cat * (logd / avg_d["log"])[:, None],
                                cat * (avg_d["log"] / logd.clamp(1e-6))[:, None]],
                               dim=1)
            out = self.post(torch.cat([h, scaled], dim=1))
            out = self.bn(out * snorm).relu()
            return h + out

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(28, H)
            self.layers = nn.ModuleList([Layer() for _ in range(L)])
            self.head = nn.Sequential(nn.Linear(H, H // 2), nn.ReLU(),
                                      nn.Linear(H // 2, H // 4), nn.ReLU(),
                                      nn.Linear(H // 4, 1))

        def forward(self):
            h = self.emb(x)
            for l in self.layers:
                h = l(h)
            hg = torch.zeros(n_graphs, H).index_add_(0, gid, h)
            hg = hg / torch.bincount(gid, minlength=n_graphs)[:, None]
            return self.head(hg)

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3, weight_decay=3e-6)
    # warmup
    for _ in range(2):
        opt.zero_grad()
        nn.L1Loss()(net(), targets).backward()
        opt.step()
    t0 = time.perf_counter()
    for _ in range(TORCH_STEPS):
        opt.zero_grad()
        nn.L1Loss()(net(), targets).backward()
        opt.step()
    dt = time.perf_counter() - t0
    return real_edges * TORCH_STEPS / dt


def main():
    from dgn_tpu.run import resolve_layout

    graphs, avg_d, real_edges = build_graphs()
    layouts = {}
    for layout in ("flat", "pallas", "mxu", "mxu_bf16", "mxu_legacy"):
        try:
            eps, step_ms, mfu = time_layout(layout, graphs, avg_d, real_edges)
            layouts[layout] = {"edges_per_s": round(eps, 1),
                               "step_ms": round(step_ms, 3)}
            if mfu is not None:
                layouts[layout]["mfu_bf16_peak"] = round(mfu, 4)
            log(f"[bench] {layout}: {eps / 1e6:.1f}M edges/s "
                f"({step_ms:.2f} ms/step, mfu={mfu})")
        except Exception as e:  # a broken layout must not hide the others
            layouts[layout] = {"error": f"{type(e).__name__}: {e}"}
            log(f"[bench] {layout} FAILED: {e}")

    default = resolve_layout("auto", 1)
    default_key = "mxu_bf16" if default == "mxu" and "mxu_bf16" in layouts \
        and "edges_per_s" in layouts.get("mxu_bf16", {}) else default
    # headline = shipped default path (best of its dtype variants)
    candidates = [k for k in (default, default_key) if
                  "edges_per_s" in layouts.get(k, {})]
    if not candidates:
        candidates = [k for k, v in layouts.items() if "edges_per_s" in v]
    head_key = max(candidates, key=lambda k: layouts[k]["edges_per_s"])
    tpu_eps = layouts[head_key]["edges_per_s"]

    try:
        pat_eps, pat_ms = bench_pattern()
        pattern = {"edges_per_s": round(pat_eps, 1),
                   "step_ms": round(pat_ms, 3)}
        log(f"[bench] pattern/mxu: {pat_eps / 1e6:.1f}M edges/s "
            f"({pat_ms:.2f} ms/step)")
    except Exception as e:
        pattern = {"error": f"{type(e).__name__}: {e}"}
        log(f"[bench] pattern FAILED: {e}")

    try:
        cpu_eps = bench_torch_cpu(graphs, avg_d, real_edges)
        ratio = tpu_eps / cpu_eps
    except Exception:
        cpu_eps, ratio = None, None
    print(json.dumps({
        "metric": "zinc_dgn_complex_train_edges_per_s_per_chip",
        "value": round(tpu_eps, 1),
        "unit": "edges/s",
        "vs_baseline": round(ratio, 3) if ratio else None,
        "detail": {
            "timing": "lax.scan-in-one-jit, scalar device fetch, per-step = "
                      f"slope between {STEPS_LO}- and {STEPS_HI}-step scans "
                      "(cancels the ~25ms fixed tunnel dispatch overhead)",
            "headline_layout": head_key,
            "layouts": layouts,
            "pattern_mxu": pattern,
            "torch_cpu_edges_per_s": round(cpu_eps, 1) if cpu_eps else None,
        },
    }))


if __name__ == "__main__":
    main()
