"""Benchmark: DGN-complex ZINC training throughput (edges/s/chip) on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = TPU edges/s divided by a torch-CPU reference implementation of
the same model (the reference stack is torch+DGL on CPU/GPU; DGL is not
installed here, so the baseline is a faithful torch re-implementation of the
reference DGNLayerComplex math using index_add scatter ops — the same
computational graph the reference executes).

Workload: synthetic ZINC-shaped molecules (9..37 atoms), batch of 1024 graphs,
DGN complex L=4 hidden=45, aggregators "mean dir1-dx dir1-av", scalers
"identity amplification attenuation" — the headline ZINC config
(reference configs/molecules_graph_regression_DGN_ZINC.json).
"""
from __future__ import annotations

import json
import time

import numpy as np

BATCH = 1024
STEPS = 30
WARMUP = 5
HIDDEN = 45
L = 4
TORCH_STEPS = 6


def build_workload():
    from dgn_tpu.data import synthetic
    from dgn_tpu.graph import pack_graphs
    from dgn_tpu.ops.scalers import degree_stats

    graphs = synthetic.synthetic_zinc(BATCH, seed=41)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    avg_d = degree_stats(degs)
    tot_n = sum(g.num_nodes for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    n_pad = ((tot_n + 1 + 127) // 128) * 128
    e_pad = ((tot_e + 127) // 128) * 128
    gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=BATCH)
    return graphs, gb, avg_d, tot_e


def bench_tpu(gb, avg_d, real_edges):
    import jax
    import jax.numpy as jnp

    from dgn_tpu.models import DGNConfig, zinc_model
    from dgn_tpu.train.trainer import TrainParams, Trainer

    cfg = DGNConfig(hidden_dim=HIDDEN, out_dim=HIDDEN, L=L,
                    type_net="complex",
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation",
                    avg_d=avg_d)
    model, loss_fn = zinc_model(cfg)
    params = TrainParams(seed=41, init_lr=1e-3, weight_decay=3e-6)
    trainer = Trainer(model, loss_fn, params, task="zinc", donate=False)
    state = trainer.init_state(gb)
    lr = jnp.asarray(1e-3, jnp.float32)
    rng = jax.random.PRNGKey(0)

    for _ in range(WARMUP):
        state, loss, _ = trainer._train_step(state, gb, rng, lr)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss, _ = trainer._train_step(state, gb, rng, lr)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return real_edges * STEPS / dt


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
    graphs, gb, avg_d, real_edges = build_workload()
    tpu_eps = bench_tpu(gb, avg_d, real_edges)
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
    }))


if __name__ == "__main__":
    main()
