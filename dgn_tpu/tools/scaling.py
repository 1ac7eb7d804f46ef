"""1->N scaling harness: step-time + efficiency for DP and EP partitioning.

Measures the strong-scaling curve of the DGN train step — fixed GLOBAL batch,
N devices — for both multi-device strategies this framework ships (the
reference has no distributed mode to compare against, SURVEY.md §2b):

  dp  data parallelism: batch axis sharded, pmean grads, sync-BN
  ep  edge partitioning: one batch's node/edge axes sharded, boundary-only
      halo all_to_all per layer (graph.halo_refresh)

Timing is K steps inside ONE jit (lax.scan) with a scalar fetch — the method
that stays honest through the axon TPU tunnel (see bench.py).  Efficiency is
t_1 / (N * t_N); 1.0 = perfect strong scaling.

Because this sandbox has one real chip, measured multi-device numbers only
exist on the shared-host virtual CPU mesh (where "efficiency" measures host
contention, not ICI).  Each row therefore ALSO carries an ANALYTIC model,
host-computable exactly:
  comm_bytes_per_step — dp: ring all-reduce of the gradients,
                        2*params*4*(N-1)/N bytes through each chip;
                        ep: per layer, each shard ships its send_idx rows
                        (N*S*hidden floats) out and receives as many in,
                        forward AND backward (the all_to_all transpose),
                        plus the readout-pool psums.
  predicted_efficiency — t1/N / (t1/N + comm_bytes/ici_bw): the no-overlap
                        lower bound with compute from the measured 1-device
                        step.  --ici_bw sets the per-chip ICI budget
                        (default 9e10 B/s ~ a v5e 1D ring direction pair);
                        the EP path's interior/boundary split (layers/dgn.py)
                        is designed to hide part of the comm term, so real
                        pods should land between predicted and 1.0.

Run anywhere:
  real pod      python -m dgn_tpu.tools.scaling --devices 1,2,4,8
  virtual mesh  JAX_PLATFORMS=cpu \
                XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                python -m dgn_tpu.tools.scaling   (numbers indicative only)

Prints one JSON line per (partition, n_devices).
"""
from __future__ import annotations

import argparse
import json
import time
from functools import partial
from typing import Optional

import numpy as np


def _flagship(batch: int, hidden: int, L: int, bn_axis: Optional[str]):
    from ..data import synthetic
    from ..models import DGNConfig, zinc_model
    from ..ops.scalers import degree_stats

    graphs = synthetic.synthetic_zinc(batch, seed=41)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in graphs])
    cfg = DGNConfig(hidden_dim=hidden, out_dim=hidden, L=L,
                    type_net="complex",
                    aggregators="mean dir1-dx dir1-av",
                    scalers="identity amplification attenuation",
                    avg_d=degree_stats(degs), bn_axis=bn_axis)
    model, loss_fn = zinc_model(cfg)
    real_edges = sum(g.num_edges for g in graphs)
    return model, loss_fn, graphs, real_edges


def _time_steps(trainer, state, gb, steps: int, n_rngs: int = 0):
    """K steps in one jit; returns seconds/step.  n_rngs>0 -> per-shard rng
    rows (the DataParallelTrainer step signature)."""
    import jax
    import jax.numpy as jnp

    lr = jnp.asarray(1e-3, jnp.float32)

    def body(carry, _):
        st, key = carry
        key, sub = jax.random.split(key)
        r = jax.random.split(sub, n_rngs) if n_rngs else sub
        st, loss, _ = trainer._train_step(st, gb, r, lr)
        return (st, key), loss

    @partial(jax.jit, static_argnums=(2,))
    def run(st, key, n):
        (st, _), losses = jax.lax.scan(body, (st, key), None, length=n)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return losses.sum() + 0.0 * leaf.reshape(-1)[0]

    key = jax.random.PRNGKey(0)
    probe = float(run(state, key, steps))          # compile + warm
    assert np.isfinite(probe), probe
    t0 = time.perf_counter()
    probe = float(run(state, key, steps))          # scalar fetch = sync
    dt = time.perf_counter() - t0
    assert np.isfinite(probe), probe
    return dt / steps


def measure_dp(n: int, batch: int, hidden: int, L: int, steps: int) -> float:
    import jax

    from ..parallel import DataParallelTrainer, StackedLoader, make_mesh
    from ..train.trainer import TrainParams, Trainer

    params = TrainParams(seed=41, init_lr=1e-3)
    if n == 1:
        model, loss_fn, graphs, _ = _flagship(batch, hidden, L, None)
        from ..graph import bucket_sizes_for, pack_graphs
        n_pad, e_pad = bucket_sizes_for(graphs, batch)
        gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=batch)
        trainer = Trainer(model, loss_fn, params, task="zinc", donate=False)
        state = trainer.init_state(gb)
        return _time_steps(trainer, state, gb, steps)
    model, loss_fn, graphs, _ = _flagship(batch, hidden, L, "dp")
    mesh = make_mesh(n, ("dp",))
    per_dev = batch // n
    loader = StackedLoader(graphs, per_device_batch=per_dev, n_shards=n,
                           mesh=mesh)
    gb = next(iter(loader))
    trainer = DataParallelTrainer(model, loss_fn, params, mesh, task="zinc")
    import jax as _jax
    state = trainer.init_state(_jax.tree_util.tree_map(lambda x: x[0], gb))
    return _time_steps(trainer, state, gb, steps, n_rngs=n)


def measure_ep(n: int, batch: int, hidden: int, L: int, steps: int) -> float:
    from ..parallel import make_mesh
    from ..parallel.halo import EdgeParallelTrainer, partition_batch
    from ..train.trainer import TrainParams

    params = TrainParams(seed=41, init_lr=1e-3)
    model, loss_fn, graphs, _ = _flagship(batch, hidden, L,
                                          "ep" if n > 1 else None)
    if n == 1:
        from ..graph import bucket_sizes_for, pack_graphs
        from ..train.trainer import Trainer
        n_pad, e_pad = bucket_sizes_for(graphs, batch)
        gb = pack_graphs(graphs, n_pad=n_pad, e_pad=e_pad, g_pad=batch)
        trainer = Trainer(model, loss_fn, params, task="zinc", donate=False)
        state = trainer.init_state(gb)
        return _time_steps(trainer, state, gb, steps)
    mesh = make_mesh(n, ("ep",))
    # shipped EP layout: shard-local MXU blocks + interior/boundary overlap
    pb = partition_batch(graphs, n, g_pad=batch, layout="mxu")
    trainer = EdgeParallelTrainer(model, loss_fn, params, mesh, task="zinc")
    state = trainer.init_state(pb)
    return _time_steps(trainer, state, pb, steps)


def comm_model(part: str, n: int, batch: int, hidden: int, L: int) -> int:
    """EXACT host-computed communication volume (bytes through each chip per
    train step) for the partition strategy — no device work needed."""
    if n <= 1:
        return 0
    if part == "dp":
        # ring all-reduce of f32 gradients: each chip sends and receives
        # 2*(N-1)/N of the parameter bytes (reduce-scatter + all-gather)
        import jax

        from ..graph import pack_graphs
        model, _, graphs, _ = _flagship(min(batch, 8), hidden, L, None)
        gb = pack_graphs(graphs[:4], g_pad=4)
        variables = model.init(jax.random.PRNGKey(0), gb, deterministic=True)
        n_params = sum(int(np.prod(np.shape(p))) for p in
                       jax.tree_util.tree_leaves(variables["params"]))
        return int(2 * n_params * 4 * (n - 1) / n)
    if part == "ep":
        # per layer: ship send_idx rows out + receive the halo in (fwd), and
        # the same volume back through the all_to_all transpose (bwd); plus
        # L+1 psums of the per-graph readout/VN pools
        from ..parallel.halo import partition_batch
        model, _, graphs, _ = _flagship(batch, hidden, L, None)
        pb = partition_batch(graphs, n, g_pad=batch)
        s_max = int(pb.halo.send_idx.shape[-1])
        per_layer = 2 * (n * s_max * hidden * 4)       # out + in, f32
        pool = 2 * batch * hidden * 4                  # psum'd graph pools
        return int(L * 2 * per_layer + (L + 1) * pool)
    raise ValueError(part)


def run_scaling(partitions=("dp", "ep"), devices=(1, 2, 4, 8),
                batch: int = 128, hidden: int = 45, L: int = 4,
                steps: int = 10, ici_bw: float = 9e10, emit=print):
    import jax

    avail = len(jax.devices())
    results = {}
    for part in partitions:
        base = None
        for n in devices:
            if n > avail:
                continue
            fn = measure_dp if part == "dp" else measure_ep
            sec = fn(n, batch, hidden, L, steps)
            if base is None:
                base = sec
            eff = base / (n * sec)
            comm = comm_model(part, n, batch, hidden, L)
            t_comm = comm / ici_bw
            pred = (base / n) / (base / n + t_comm) if n > 1 else 1.0
            row = {"metric": f"scaling_{part}", "n_devices": n,
                   "step_ms": round(sec * 1e3, 3),
                   "efficiency": round(eff, 4),
                   "comm_bytes_per_step": comm,
                   "predicted_efficiency": round(pred, 4),
                   # predicted_efficiency is the NO-OVERLAP lower bound
                   # (t1/N)/(t1/N + comm/ici_bw) at the ASSUMED per-chip ICI
                   # bandwidth below (default ~v5e 1D ring); it is a model,
                   # not a measurement — real multi-chip numbers need a slice.
                   "ici_bw": ici_bw,
                   "predicted_model": "no-overlap bound at assumed ici_bw",
                   "global_batch": batch, "backend": jax.default_backend()}
            results[(part, n)] = row
            emit(json.dumps(row))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--partition", default="dp,ep")
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=45)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--ici_bw", type=float, default=9e10,
                    help="per-chip ICI byte/s budget for the analytic "
                         "predicted_efficiency (default ~v5e 1D ring)")
    ap.add_argument("--backend", default=None,
                    help="force a jax platform (e.g. 'cpu' for the virtual "
                         "mesh) — needed because the axon TPU plugin pins "
                         "jax_platforms via jax.config, which beats the "
                         "JAX_PLATFORMS env var")
    a = ap.parse_args(argv)
    if a.backend:
        import jax
        jax.config.update("jax_platforms", a.backend)
    run_scaling(tuple(a.partition.split(",")),
                tuple(int(x) for x in a.devices.split(",")),
                a.batch, a.hidden, a.L, a.steps, ici_bw=a.ici_bw)


if __name__ == "__main__":
    main()
