"""Unified experiment driver: `python -m dgn_tpu.run --config ... [flags]`.

One entry point replaces the reference's five near-identical main_*.py
scripts (reference realworld_benchmark/main_{molecules,SBMs_node_
classification,superpixels,HIV,PCBA}.py); the task is inferred from the
config's dataset.  Pipeline (reference main_molecules.py:159-307):

  config (JSON + CLI overlay) -> dataset (real files or synthetic fallback)
  -> avg_d degree stats over train -> inferred dims -> model factory
  -> Trainer (Adam + ReduceLROnPlateau, seeded) -> epoch loop with val/test
  eval, min-lr and max_time stops -> final train/val/test report
  — plus checkpoint/resume and multi-device data parallelism the reference
  lacks.
"""
from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import numpy as np


def view_model_param(model, example_batch) -> int:
    """Total trainable parameter count (reference main_molecules.py:53-60)."""
    import jax
    variables = model.init(jax.random.PRNGKey(41), example_batch,
                           deterministic=True)
    return sum(np.prod(np.shape(p))
               for p in jax.tree_util.tree_leaves(variables["params"]))


def pad_geometry(graphs, batch_size: int, layout: str = "flat"):
    """Static (n_pad, e_pad) for a batch under the given layout.

    Uses the sum-of-largest-graphs bound (graph.bucket_sizes_for) — safe for
    ANY batch_size subset under shuffling, and far tighter than the naive
    batch x max_graph bound (~60% -> ~97% node-slot efficiency on ZINC)."""
    from .graph import bucket_sizes_for, mxu_bucket_sizes
    if layout == "mxu":
        n_pad, e_pad, _ = mxu_bucket_sizes(graphs, batch_size)
        return n_pad, e_pad
    return bucket_sizes_for(graphs, batch_size)


def resolve_layout(layout: str, n_devices: int = 1,
                   partition: str = "dp") -> str:
    """'auto' -> the fastest measured layout for the execution mode.

    Every mode takes the block-diagonal MXU packing (the benchmarked hot
    path, ops/mxu.py); edge-partitioned runs use the shard-local variant
    (parallel/halo.py partition_batch(layout='mxu')) whose interior/boundary
    pair split overlaps the halo exchange with interior aggregation."""
    if layout != "auto":
        return layout
    return "mxu"


def prepare(cfg, n_devices: int = 1, partition: str = "dp"):
    """dataset + model + trainer wiring shared by run() and tests."""
    import jax

    from .data.datasets import load_dataset
    from .data.loader import BatchLoader
    from .graph import pack_graphs
    from .models import MODEL_FACTORIES
    from .ops.scalers import degree_stats
    from .train.trainer import Trainer

    ds = load_dataset(cfg.dataset, cfg.data)
    task = cfg.task
    np_cfg = cfg.net_params

    # derived config from data (reference main_*.py:285-304)
    degs = np.concatenate([np.bincount(g.dst, minlength=g.num_nodes)
                           for g in ds.train])
    avg_d = degree_stats(degs)
    np_cfg = dataclasses.replace(np_cfg, avg_d=avg_d)
    if task == "sbm":
        np_cfg = dataclasses.replace(np_cfg,
                                     num_node_types=ds.meta["num_node_types"])
    if task == "zinc":
        np_cfg = dataclasses.replace(
            np_cfg, num_node_types=ds.meta["num_atom_type"],
            num_edge_types=ds.meta["num_bond_type"],
            edge_dim=np_cfg.edge_dim or np_cfg.hidden_dim)
    if task == "superpixels":
        np_cfg = dataclasses.replace(
            np_cfg, edge_dim=np_cfg.edge_dim or np_cfg.hidden_dim)
    if cfg.data.pos_enc_dim > 0:
        np_cfg = dataclasses.replace(np_cfg,
                                     pos_enc_dim=cfg.data.pos_enc_dim)

    factory = MODEL_FACTORIES[task]
    if task == "sbm":
        model, loss_fn = factory(np_cfg, ds.meta["n_classes"])
    elif task == "superpixels":
        model, loss_fn = factory(np_cfg, ds.meta["n_classes"])
    else:
        model, loss_fn = factory(np_cfg)

    layout = resolve_layout(cfg.data.layout, n_devices, partition)
    bs = cfg.params.batch_size
    all_graphs = ds.train + ds.val + ds.test
    loaders = {}

    def rebuild(np_cfg):
        if task in ("sbm", "superpixels"):
            return factory(np_cfg, ds.meta["n_classes"])
        return factory(np_cfg)

    if n_devices > 1 and partition == "ep":
        # edge-partitioned: one batch's node/edge axes sharded over 'ep'
        from .parallel import EdgeParallelTrainer, PartitionedLoader, make_mesh
        mesh = make_mesh(n_devices, ("ep",))
        np_cfg = dataclasses.replace(np_cfg, bn_axis="ep")
        model, loss_fn = rebuild(np_cfg)
        trainer = EdgeParallelTrainer(model, loss_fn, cfg.params, mesh,
                                      task=task, node_level=(task == "sbm"))
        for split, gs in ds.splits.items():
            loaders[split] = PartitionedLoader(
                gs, batch_size=bs, n_shards=n_devices,
                shuffle=(split == "train"), seed=cfg.params.seed, g_pad=bs,
                layout=layout)
        example = pack_graphs(ds.train[:min(bs, len(ds.train))], g_pad=bs)
    elif n_devices > 1:
        from .parallel import DataParallelTrainer, StackedLoader, make_mesh
        mesh = make_mesh(n_devices, ("dp",))
        np_cfg = dataclasses.replace(np_cfg, bn_axis="dp")
        model, loss_fn = rebuild(np_cfg)
        per_dev = max(bs // n_devices, 1)
        n_pad, e_pad = pad_geometry(all_graphs, per_dev, layout)
        trainer = DataParallelTrainer(model, loss_fn, cfg.params, mesh,
                                      task=task)
        for split, gs in ds.splits.items():
            loaders[split] = StackedLoader(
                gs, per_device_batch=per_dev, n_shards=n_devices, mesh=mesh,
                n_pad=n_pad, e_pad=e_pad, shuffle=(split == "train"),
                seed=cfg.params.seed, layout=layout)
        example = pack_graphs(ds.train[:min(per_dev, len(ds.train))],
                              n_pad=n_pad, e_pad=e_pad,
                              g_pad=loaders["train"].g_pad,
                              mxu_layout=layout == "mxu")
    else:
        trainer = Trainer(model, loss_fn, cfg.params, task=task)
        mb = cfg.data.micro_batches
        # auto: keep each packed unit at the measured ~1024-graphs/chip knee
        mb = max(1, -(-bs // 1024)) if mb == "auto" else max(1, int(mb))
        for split, gs in ds.splits.items():
            if cfg.data.n_buckets > 1:
                from .data.loader import BucketedLoader
                loaders[split] = BucketedLoader(
                    gs, batch_size=bs, n_buckets=cfg.data.n_buckets,
                    shuffle=(split == "train"), seed=cfg.params.seed,
                    layout=layout)
            else:
                # shuffled train: typical/worst per cfg; unshuffled val/test:
                # exact geometry over their fixed batch partition (loader.py)
                # val/test batches are fixed across epochs: cache the packed
                # batches so the trainer reuses their edge context too
                loaders[split] = BatchLoader(gs, batch_size=bs,
                                             shuffle=(split == "train"),
                                             seed=cfg.params.seed,
                                             layout=layout,
                                             geometry=cfg.data.geometry,
                                             cache=(split != "train"),
                                             micro_batches=mb)
        # example batch only seeds init/param-count; auto (exact) pads are
        # always safe, and param shapes don't depend on batch geometry
        ex_n = min(getattr(loaders["train"], "micro_size", bs), bs,
                   len(ds.train))
        example = pack_graphs(ds.train[:ex_n],
                              g_pad=loaders["train"].g_pad,
                              mxu_layout=layout == "mxu")
    return ds, model, loss_fn, trainer, loaders, example


def run_collab(cfg):
    """Link-prediction driver (ogbl-collab protocol): one big graph, batched
    positive edges + real-node negative sampling, Hits@K eval — the runnable
    form of the reference's orphaned COLLAB trainer
    (reference train/train_COLLAB_edge_classification.py)."""
    import dataclasses as dc

    from .data.datasets import load_collab
    from .graph import pack_graphs
    from .ops.scalers import degree_stats
    from .train.link_pred import LinkPredTrainer, collab_model

    t0 = time.time()
    g, splits, meta = load_collab(cfg.data)
    degs = np.bincount(g.dst, minlength=g.num_nodes)
    np_cfg = dc.replace(cfg.net_params, node_encoder="linear",
                        avg_d=degree_stats(degs))
    model = collab_model(np_cfg)
    gb = pack_graphs([g], g_pad=1)
    trainer = LinkPredTrainer(model, cfg.params)
    variables, opt_state = trainer.init(gb)
    best_val, test_at_best = -1.0, None
    for epoch in range(cfg.params.epochs):
        variables, opt_state, loss = trainer.train_epoch(
            variables, opt_state, gb, splits["train"], epoch)
        val = trainer.evaluate(variables, gb, splits["valid"],
                               splits["valid_neg"])
        test = trainer.evaluate(variables, gb, splits["test"],
                                splits["test_neg"])
        trainer.scheduler.step(-val["hits@50"])
        if val["hits@50"] > best_val:
            best_val, test_at_best = val["hits@50"], test
        if epoch % cfg.params.print_epoch_interval == 0:
            print(f"epoch {epoch}: loss={loss:.4f} val={val} test={test}")
        if trainer.scheduler.lr <= cfg.params.min_lr * (1 + 1e-9):
            break
        if (time.time() - t0) / 3600.0 > cfg.params.max_time:
            break
    report = {"dataset": "COLLAB", "best_val_hits@50": best_val,
              "test_at_best_val": test_at_best,
              "total_time_h": (time.time() - t0) / 3600.0}
    print("[dgn_tpu] FINAL " + json.dumps(report, default=float))
    return report


def run(argv=None):
    from .config import config_from_args

    cfg, args = config_from_args(argv)
    if getattr(args, "multihost", False):
        # must precede every other JAX call (incl. device queries below)
        from .parallel.mesh import init_multihost
        pid, pcount = init_multihost(args.coordinator_address,
                                     args.num_processes, args.process_id)
        import jax
        print(f"[dgn_tpu] multihost: process {pid}/{pcount}, "
              f"{jax.device_count()} global devices")
    if cfg.task == "collab":
        return run_collab(cfg)
    if getattr(args, "multihost", False) and args.n_devices is None:
        import jax
        n_devices = jax.device_count()      # the pod's global device set
    else:
        n_devices = args.n_devices or 1
    partition = getattr(args, "partition", "dp")
    if getattr(args, "seeds", None):
        seeds = [int(s) for s in args.seeds.split(",")]
        return run_seeds(cfg, args, seeds, n_devices, partition)
    return run_one(cfg, args, n_devices, partition)


def run_seeds(cfg, args, seeds, n_devices, partition):
    """Multi-seed protocol: the reference reports mean±std over 4 seeds
    (reference realworld_benchmark/README.md:32 comparison table; seeds set
    per run via params.seed).  One command yields the table row."""
    import argparse
    import dataclasses as dc
    import os

    reports = []
    for s in seeds:
        c = dc.replace(cfg, params=dc.replace(cfg.params, seed=s),
                       out_dir=os.path.join(cfg.out_dir, f"seed{s}"))
        # seeds must not share checkpoint state (a shared dir would make
        # --resume restore seed i's weights into seed i+1's run)
        a = argparse.Namespace(**vars(args))
        if getattr(args, "checkpoint", None):
            a.checkpoint = os.path.join(args.checkpoint, f"seed{s}")
        print(f"[dgn_tpu] ==== seed {s} ====")
        reports.append(run_one(c, a, n_devices, partition))
    agg = {}
    # a seed can legally finish without a best-val record (interrupt before
    # the first val eval) — aggregate over the seeds that have one
    done = [(s, r["test_at_best_val"]) for s, r in zip(seeds, reports)
            if r.get("test_at_best_val")]
    keys = set().union(*(set(t) for _, t in done)) if done else set()
    for k in ("mae", "acc", "rocauc", "ap"):
        if k not in keys:
            continue
        vals = [t[k] for _, t in done if k in t]
        agg[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
        print(f"[dgn_tpu] TEST {k.upper()}: {np.mean(vals):.4f} "
              f"± {np.std(vals):.4f} ({len(vals)}/{len(seeds)} seeds)")
    out = {"dataset": cfg.dataset, "seeds": seeds,
           "test_at_best_val": agg,
           "per_seed": [r.get("test_at_best_val") for r in reports]}
    print("[dgn_tpu] SEEDS " + json.dumps(out, default=float))
    return out


def run_one(cfg, args, n_devices, partition):
    from .train.checkpoint import Checkpointer

    print(f"[dgn_tpu] dataset={cfg.dataset} task={cfg.task} "
          f"n_devices={n_devices} partition={partition} "
          f"layout={resolve_layout(cfg.data.layout, n_devices, partition)}")
    t0 = time.time()
    ds, model, loss_fn, trainer, loaders, example = prepare(
        cfg, n_devices, partition)
    print(f"[dgn_tpu] data ready in {time.time() - t0:.1f}s "
          f"(train/val/test = {len(ds.train)}/{len(ds.val)}/{len(ds.test)})")
    n_param = view_model_param(model, example)
    print(f"[dgn_tpu] MODEL/Total parameters: {n_param}")

    state = trainer.init_state(example)
    start_epoch = 0
    checkpointer = None
    if args.checkpoint:
        checkpointer = Checkpointer(args.checkpoint)
        if args.resume and checkpointer.latest_epoch() is not None:
            state, start_epoch = checkpointer.restore(
                state, scheduler=trainer.scheduler)
            print(f"[dgn_tpu] resumed from epoch {start_epoch - 1}")

    from .observe import MetricStream
    import os
    stream = MetricStream(os.path.join(cfg.out_dir, "metrics.jsonl"))
    result = trainer.fit(state, loaders["train"], loaders["val"],
                         loaders["test"], checkpointer=checkpointer,
                         start_epoch=start_epoch, stream=stream)
    stream.close()

    final_train = trainer.evaluate(result["state"], loaders["train"])
    final_val = trainer.evaluate(result["state"], loaders["val"])
    final_test = trainer.evaluate(result["state"], loaders["test"])
    report = {
        "dataset": cfg.dataset,
        "params": n_param,
        "epochs_run": len(result["history"]),
        "best_epoch": result["best_epoch"],
        "final": {"train": final_train, "val": final_val,
                  "test": final_test},
        "test_at_best_val": result["test_at_best"],
        "total_time_h": (time.time() - t0) / 3600.0,
    }
    print("[dgn_tpu] FINAL " + json.dumps(report, default=float))
    return report


if __name__ == "__main__":
    run()
