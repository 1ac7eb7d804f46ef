"""Training harness: jit train/eval steps, epoch loops, plateau LR, stops.

Replicates the reference train_val_pipeline skeleton
(reference main_molecules.py:68-156): seeded init, Adam(+L2) with
ReduceLROnPlateau on the validation objective, per-epoch train/val/test
evaluation, min-lr early stop, max_time stop — plus what the reference lacks:
checkpoint/resume (SURVEY.md §5) and device-sharded data parallelism
(parallel/).

Everything device-side is a single jitted step over a fixed-shape GraphBatch;
metrics are accumulated host-side on unpadded elements.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import GraphBatch
from ..ops import field
from . import metrics as M
from .optim import ReduceLROnPlateau, adam_l2


@dataclasses.dataclass
class TrainParams:
    """The `params` block of the reference configs (configs/*.json)."""
    seed: int = 41
    epochs: int = 1000
    batch_size: int = 128
    init_lr: float = 1e-3
    lr_reduce_factor: float = 0.5
    lr_schedule_patience: int = 20
    min_lr: float = 1e-5
    weight_decay: float = 0.0
    print_epoch_interval: int = 5
    max_time: float = 48.0            # hours
    # augmentation (reference CLI flags --flip/--augmentation/--distortion)
    flip: bool = False
    augmentation: float = 0.0
    distortion: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def _augment(gb: GraphBatch, rng, p: TrainParams) -> GraphBatch:
    eig = gb.eig
    k1, k2, k3 = jax.random.split(rng, 3)
    if p.augmentation > 1e-7:
        eig = field.rotate_field(eig, k1, p.augmentation)
    if p.flip:
        eig = field.sign_flip(eig, k2)
    if p.distortion > 1e-7:
        eig = field.distort_field(eig, k3, p.distortion,
                                  node_mask=gb.node_mask)
    return dataclasses.replace(gb, eig=eig)


class Trainer:
    """Single-model training driver.

    task: 'zinc' | 'sbm' | 'superpixels' | 'hiv' | 'pcba' — controls the epoch
    metric and the sign of the plateau objective (HIV/PCBA step on -metric,
    reference main_HIV.py:144).
    """

    def __init__(self, model, loss_fn, params: TrainParams, task: str = "zinc",
                 n_devices: int = 1, mesh=None, donate: bool = True):
        self.model = model
        self.loss_fn = loss_fn
        self.p = params
        self.task = task
        self.tx = adam_l2(params.init_lr, params.weight_decay)
        self.scheduler = ReduceLROnPlateau(
            lr=params.init_lr, factor=params.lr_reduce_factor,
            patience=params.lr_schedule_patience, min_lr=params.min_lr)
        self.mesh = mesh
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,) if donate else ())
        self._eval_step = jax.jit(self._eval_step_impl)
        # eval-context cache: the EdgeContext (eig deltas, weight families,
        # adjacency blocks) is batch-constant and parameter-free, and eval
        # loaders with cache=True replay the SAME GraphBatch objects every
        # epoch — so build it once per batch and reuse it every eval step
        # (~0.9 of 1.9 ms on the ZINC step, RESULTS.md stage accounting).
        self._ctx_cache: Dict[int, Any] = {}
        self._ctx_build = None

    # ------------------------------------------------------------- state
    def init_state(self, example_batch: GraphBatch,
                   seed: Optional[int] = None) -> TrainState:
        key = jax.random.PRNGKey(self.p.seed if seed is None else seed)
        variables = self.model.init(key, example_batch, deterministic=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------- steps
    def _apply(self, params, batch_stats, gb, deterministic, rngs=None,
               mutable=False):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        kw = dict(deterministic=deterministic)
        if mutable:
            return self.model.apply(variables, gb, rngs=rngs,
                                    mutable=["batch_stats"], **kw)
        return self.model.apply(variables, gb, rngs=rngs, **kw)

    def _loss_weight(self, gb: GraphBatch):
        """The denominator of this task's batch-mean loss — the weight that
        makes a weighted average of micro-batch losses EXACTLY the full-batch
        loss (train/losses.py normalizations)."""
        if self.task == "pcba":      # mean over labeled (graph, task) entries
            lab = gb.labels
            m = (lab == lab) & gb.graph_mask[:, None]
            return jnp.sum(m.astype(jnp.float32))
        if self.task == "sbm":       # node-level loss
            return jnp.sum(gb.node_mask.astype(jnp.float32))
        return jnp.sum(gb.graph_mask.astype(jnp.float32))

    def _grads_of(self, params, batch_stats, gb, dropout_rng):
        def loss_of(p):
            out = self._apply(p, batch_stats, gb, deterministic=False,
                              rngs={"dropout": dropout_rng}, mutable=True)
            scores, mut = out
            loss = self.loss_fn(scores, gb)
            return loss, (scores, mut.get("batch_stats", {}))

        return jax.value_and_grad(loss_of, has_aux=True)(params)

    def _train_step_impl(self, state: TrainState, gb, rng, lr):
        aug_rng, dropout_rng = jax.random.split(rng)
        if isinstance(gb, (list, tuple)):
            loss, scores, new_bs, grads = self._micro_batched(
                state, list(gb), aug_rng, dropout_rng)
        else:
            gb = _augment(gb, aug_rng, self.p)
            (loss, (scores, new_bs)), grads = self._grads_of(
                state.params, state.batch_stats, gb, dropout_rng)
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                            updates)
        return (TrainState(new_params, new_bs, new_opt, state.step + 1),
                loss, scores)

    def _micro_batched(self, state: TrainState, gbs, aug_rng, dropout_rng):
        """K micro-batches inside ONE jitted step: lax.scan + gradient
        accumulation, one optimizer update.

        Loss/grads are the EXACT full-batch batch-mean (micro losses averaged
        with the task's denominator weights, _loss_weight) — except SBM,
        whose class weights are re-estimated per micro batch (documented
        divergence, like sync-BN).  BatchNorm statistics are per MICRO batch
        and running stats update K times per step (the same choice DP makes
        per shard with sync-BN off).  Augmentation draws once per super-batch
        (the reference flips once per loader batch,
        train_molecules_graph_regression.py:29-33).
        Rationale: per-edge cost RISES with packed batch size (BENCH_r04
        batch_sweep — adjacency-block build and per-op constants grow while
        nothing amortizes), so batches above the ~1024-graph/chip knee run a
        silently degraded regime; K micro-batches at the knee keep the fast
        operating point while preserving the reference's loss semantics at
        the configured batch size (e.g. PCBA's canonical 2048).
        """
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *gbs)
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)

        def body(carry, gb_k):
            bstats, gsum, lsum, wsum = carry
            gb_k = _augment(gb_k, aug_rng, self.p)
            (loss, (scores, new_bs)), grads = self._grads_of(
                state.params, bstats, gb_k, dropout_rng)
            w = self._loss_weight(gb_k)
            gsum = jax.tree_util.tree_map(lambda a, g: a + w * g, gsum, grads)
            return (new_bs, gsum, lsum + w * loss, wsum + w), scores

        # unroll: a straight-line program instead of a while loop — measured
        # ~0.7 ms/micro of loop overhead on TPU otherwise (and static slices
        # of the stacked batch fold better); K is small (auto: batch/1024)
        (new_bs, gsum, lsum, wsum), scores = jax.lax.scan(
            body, (state.batch_stats, zero_g, jnp.float32(0), jnp.float32(0)),
            stacked, unroll=min(len(gbs), 8))
        wsum = jnp.maximum(wsum, 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / wsum, gsum)
        return lsum / wsum, scores, new_bs, grads

    def _eval_step_impl(self, state: TrainState, gb: GraphBatch):
        scores = self._apply(state.params, state.batch_stats, gb,
                             deterministic=True)
        return scores, self.loss_fn(scores, gb)

    # ------------------------------------------------------------- epochs
    def train_epoch(self, state: TrainState, loader, epoch: int):
        from ..observe import Throughput
        p = self.p
        key = jax.random.PRNGKey((p.seed * 100003 + epoch) & 0x7FFFFFFF)
        acc = _MetricAccumulator(self.task)
        tp = Throughput()
        escapes0 = getattr(loader, "n_escapes", 0)
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        for i, gb in enumerate(loader):
            key, sub = jax.random.split(key)
            state, loss, scores = self._train_step(state, gb, sub, lr)
            if isinstance(gb, (list, tuple)):   # micro-batched super-batch
                scores = np.asarray(scores)
                for k, g in enumerate(gb):
                    acc.add(g, scores[k], float(loss) if k == 0 else None)
                    tp.add_batch(g)
            else:
                acc.add(gb, np.asarray(scores), float(loss))
                tp.add_batch(gb)
        r = tp.result()
        self._last_throughput = {
            "edges_per_s": round(r["edges_per_s"], 1),
            "edge_padding_efficiency": round(r["edge_padding_efficiency"], 4),
        }
        # repacks THIS epoch, not the loader's lifetime count (data/loader.py)
        escapes = getattr(loader, "n_escapes", 0) - escapes0
        if escapes:
            self._last_throughput["pack_escapes"] = escapes
        return state, acc.result()

    def with_edge_context(self, gb: GraphBatch) -> GraphBatch:
        """gb with its batch-constant EdgeContext attached, cached by batch
        identity.  Static EdgeContext fields (num_nodes, sorted_dst) cannot
        round-trip a jit boundary as pytree leaves, so the jitted builder
        returns the array fields and the context is reassembled host-side."""
        cfg = getattr(self.model, "cfg", None)
        if cfg is None or gb.edge_ctx is not None:
            return gb
        key = id(gb)
        hit = self._ctx_cache.get(key)
        if hit is not None and hit[0] is gb:
            return hit[1]
        from ..models.dgn_net import edge_context_for
        from ..ops.aggregators import EdgeContext
        if self._ctx_build is None:
            def fields(g):
                ctx = edge_context_for(g, cfg)
                return {f.name: getattr(ctx, f.name)
                        for f in dataclasses.fields(ctx)
                        if f.name not in ("num_nodes", "sorted_dst")}
            self._ctx_build = jax.jit(fields)
        ctx = EdgeContext(num_nodes=gb.num_nodes_padded,
                          sorted_dst=gb.mxu is None,
                          **self._ctx_build(gb))
        out = dataclasses.replace(gb, edge_ctx=ctx)
        self._ctx_cache[key] = (gb, out)
        return out

    def evaluate(self, state: TrainState, loader):
        acc = _MetricAccumulator(self.task)
        # context reuse only helps when the loader replays identical batch
        # objects (BatchLoader(cache=True)); otherwise id() never hits and
        # the cache would only grow
        reuse = getattr(loader, "cache", False)
        for gb in loader:
            micros = gb if isinstance(gb, (list, tuple)) else [gb]
            for g in micros:
                scores, loss = self._eval_step(
                    state, self.with_edge_context(g) if reuse else g)
                acc.add(g, np.asarray(scores), float(loss))
        return acc.result()

    # ------------------------------------------------------------- fit
    def fit(self, state: TrainState, train_loader, val_loader=None,
            test_loader=None, log: Callable[[str], None] = print,
            checkpointer=None, start_epoch: int = 0,
            stream=None) -> Dict[str, Any]:
        """stream: optional observe.MetricStream receiving one 'epoch' record
        per epoch (loss/metric/lr/edges-per-s/padding efficiency)."""
        p = self.p
        t0 = time.time()
        history = []
        best_val = None
        best_epoch = -1
        test_at_best = None
        maximize = self.task in ("hiv", "pcba")
        try:
            for epoch in range(start_epoch, p.epochs):
                te0 = time.time()
                state, train_m = self.train_epoch(state, train_loader, epoch)
                val_m = self.evaluate(state, val_loader) if val_loader else None
                test_m = self.evaluate(state, test_loader) if test_loader else None
                row = dict(epoch=epoch, lr=self.scheduler.lr,
                           time=time.time() - te0, train=train_m, val=val_m,
                           test=test_m)
                history.append(row)
                if stream is not None:
                    stream.log("epoch", **{k: v for k, v in row.items()
                                           if k != "time"},
                               seconds=row["time"],
                               **getattr(self, "_last_throughput", {}))
                if val_m is not None:
                    obj = val_m["objective"]
                    # plateau scheduler steps on the minimized objective
                    self.scheduler.step(-obj if maximize else obj)
                    better = (best_val is None or
                              (obj > best_val if maximize else obj < best_val))
                    if better:
                        best_val, best_epoch = obj, epoch
                        test_at_best = test_m
                if epoch % p.print_epoch_interval == 0:
                    log(f"epoch {epoch}: lr={self.scheduler.lr:.2e} "
                        f"train={train_m} val={val_m} test={test_m}")
                if checkpointer is not None:
                    checkpointer.save(epoch, state, self.scheduler)
                if self.scheduler.lr <= p.min_lr * (1 + 1e-9):
                    log("lr reached min_lr — stopping (reference "
                        "main_molecules.py:130-132)")
                    break
                if (time.time() - t0) / 3600.0 > p.max_time:
                    log("max_time reached — stopping")
                    break
        except KeyboardInterrupt:
            log("interrupted — falling through to final eval")
        return dict(state=state, history=history, best_epoch=best_epoch,
                    best_val=best_val, test_at_best=test_at_best)


class _MetricAccumulator:
    """Task-specific epoch metric, padding-stripped, reference semantics."""

    def __init__(self, task: str):
        self.task = task
        self.loss_sum = 0.0
        self.n_batches = 0
        self.scores = []
        self.labels = []
        self.per_batch = []
        self.correct = 0
        self.count = 0

    def add(self, gb: GraphBatch, scores: np.ndarray, loss):
        # loss=None: extra micro-batches of one super-batch (their shared
        # loss is recorded once, with the first micro)
        if loss is not None:
            self.loss_sum += loss
            self.n_batches += 1
        gmask = np.asarray(gb.graph_mask)
        if self.task == "zinc":
            s = scores[gmask].reshape(-1)
            t = np.asarray(gb.labels)[gmask].reshape(-1)
            self.per_batch.append(M.mae(s, t))
        elif self.task == "sbm":
            nmask = np.asarray(gb.node_mask)
            self.per_batch.append(M.accuracy_sbm(
                scores[nmask], np.asarray(gb.node_labels)[nmask]))
        elif self.task == "superpixels":
            s = scores[gmask]
            t = np.asarray(gb.labels)[gmask].reshape(-1)
            self.correct += int((s.argmax(-1) == t).sum())
            self.count += len(t)
        elif self.task in ("hiv", "pcba"):
            self.scores.append(scores[gmask])
            self.labels.append(np.asarray(gb.labels)[gmask])
        else:
            raise ValueError(self.task)

    def result(self) -> Dict[str, float]:
        out = {"loss": self.loss_sum / max(self.n_batches, 1)}
        if self.task == "zinc":
            out["mae"] = float(np.mean(self.per_batch)) if self.per_batch else float("nan")
            out["objective"] = out["loss"]   # scheduler steps on val loss
        elif self.task == "sbm":
            out["acc"] = float(np.mean(self.per_batch)) if self.per_batch else 0.0
            out["objective"] = out["loss"]
        elif self.task == "superpixels":
            out["acc"] = 100.0 * self.correct / max(self.count, 1)
            out["objective"] = out["loss"]
        elif self.task in ("hiv", "pcba"):
            s = np.concatenate(self.scores) if self.scores else np.zeros((0, 1))
            y = np.concatenate(self.labels) if self.labels else np.zeros((0, 1))
            if self.task == "hiv":
                out["rocauc"] = M.roc_auc(s, y) if len(s) else float("nan")
                out["objective"] = out["rocauc"]
            else:
                out["ap"] = M.multitask_ap(s, y) if len(s) else float("nan")
                out["objective"] = out["ap"]
        return out
