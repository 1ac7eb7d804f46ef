"""Data-parallel training: shard_map over a 'dp' mesh axis.

Each device holds a full replica of the parameters and one packed GraphBatch
shard (its own local node/edge index space — no cross-device gathers in the
hot path).  Per-device gradients are pmean'd over ICI; BatchNorm runs in sync
mode (nn.MaskedBatchNorm(axis_name='dp')), which makes an N-device step
numerically equivalent to the 1-device step on the concatenated batch — the
property the distributed tests assert (SURVEY.md §4 item 4).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..graph import (GraphBatch, GraphData, bucket_sizes_for,
                     mxu_bucket_sizes, mxu_ext_caps, mxu_pair_pad,
                     mxu_pairs_needed, pack_graphs, pack_requirements,
                     round_up)
from ..train.trainer import TrainState, Trainer, TrainParams, _augment


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """[D] GraphBatches (same shapes) -> one GraphBatch with leading D axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def shard_stacked(gb: GraphBatch, mesh: Mesh, axis: str = "dp") -> GraphBatch:
    sh = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), gb)


def _flatten_stacked(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a).reshape((-1,) + a.shape[2:]), tree)


class StackedLoader:
    """Yields device-stacked GraphBatches: D equal-size shards per super-batch.

    Graphs are dealt round-robin into shards so real-graph counts per shard
    differ by at most one (loss weighting stays faithful)."""

    def __init__(self, graphs: Sequence[GraphData], per_device_batch: int,
                 n_shards: int, mesh: Optional[Mesh] = None,
                 shuffle: bool = False, seed: int = 0,
                 n_pad: Optional[int] = None, e_pad: Optional[int] = None,
                 layout: str = "flat"):
        self.graphs = list(graphs)
        self.bs = per_device_batch
        self.d = n_shards
        self.mesh = mesh
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.layout = layout
        self.n_escapes = 0
        self.g_pad = (round_up(per_device_batch, 128) if layout == "mxu"
                      else per_device_batch)
        if n_pad is None or e_pad is None:
            if layout == "mxu":
                a, b, _ = mxu_bucket_sizes(self.graphs, per_device_batch)
            else:
                a, b = bucket_sizes_for(self.graphs, per_device_batch)
            n_pad = n_pad or a
            e_pad = e_pad or b
        self.n_pad, self.e_pad = n_pad, e_pad
        self.pair_pad = (mxu_pair_pad(self.graphs, per_device_batch,
                                      n_pad, e_pad)
                         if layout == "mxu" else None)
        # shards stack into one device axis: static extremes metadata must
        # be uniform across them (loader-stable caps; escapes use defaults)
        self.ext = mxu_ext_caps(self.graphs) if layout == "mxu" else None

    def __len__(self):
        sz = self.bs * self.d
        return (len(self.graphs) + sz - 1) // sz

    def _pack_shard(self, gs, ghost: bool, n_pad: int, e_pad: int,
                    pair_pad=None, escape: bool = False):
        gb = pack_graphs(gs, n_pad=n_pad, e_pad=e_pad, g_pad=self.g_pad,
                         mxu_layout=self.layout == "mxu",
                         n_pairs_pad=pair_pad if pair_pad is not None
                         else self.pair_pad,
                         ext_caps=None if escape else self.ext)
        if ghost:
            gb = dataclasses.replace(
                gb,
                node_mask=jnp.zeros_like(gb.node_mask),
                edge_mask=jnp.zeros_like(gb.edge_mask),
                graph_mask=jnp.zeros_like(gb.graph_mask))
        return gb

    def __iter__(self):
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        super_bs = self.bs * self.d
        for i in range(0, len(idx), super_bs):
            chunk = idx[i:i + super_bs]
            shard_graphs = []
            for d in range(self.d):
                sel = chunk[d::self.d][:self.bs]
                gs = [self.graphs[j] for j in sel]
                ghost = not gs      # keep shard count fixed: ghost shard
                if ghost:
                    gs = [self.graphs[chunk[0]]]
                if self.layout == "mxu":
                    # block placement is next-fit: descending order matches
                    # the geometry estimates' simulated order (graph.py)
                    gs = sorted(gs, key=lambda g: -g.num_nodes)
                shard_graphs.append((gs, ghost))
            try:
                shards = [self._pack_shard(gs, gh, self.n_pad, self.e_pad)
                          for gs, gh in shard_graphs]
            except ValueError:
                # an oversized shard: ALL shards repack at one escape shape
                # (stacking requires one common geometry per super-batch)
                self.n_escapes += 1
                reqs = [pack_requirements(gs,
                                          mxu_layout=self.layout == "mxu")
                        for gs, _ in shard_graphs]
                n_pad = round_up(max(max(r[0] for r in reqs) + 1,
                                     self.n_pad), 512)
                e_pad = round_up(max(max(r[1] for r in reqs),
                                     self.e_pad), 512)
                pair_pad = None
                if self.layout == "mxu":
                    pair_pad = round_up(
                        max(max(mxu_pairs_needed(gs)
                                for gs, _ in shard_graphs),
                            self.pair_pad), 64)
                shards = [self._pack_shard(gs, gh, n_pad, e_pad, pair_pad,
                                           escape=True)
                          for gs, gh in shard_graphs]
            out = stack_batches(shards)
            if self.mesh is not None:
                out = shard_stacked(out, self.mesh)
            yield out


class DataParallelTrainer(Trainer):
    """Trainer whose steps run under shard_map over mesh axis 'dp'.

    The model must be built with DGNConfig(bn_axis='dp') for exact 1-vs-N
    equivalence (sync BN); without it, BN stats are per-device (the reference's
    per-GPU BatchNorm behavior).
    """

    def __init__(self, model, loss_fn, params: TrainParams, mesh: Mesh,
                 task: str = "zinc"):
        self.mesh = mesh
        super().__init__(model, loss_fn, params, task=task, mesh=mesh,
                         donate=False)
        axis = "dp"

        def train_core(state: TrainState, gb: GraphBatch, rng, lr):
            gb = jax.tree_util.tree_map(lambda x: x[0], gb)
            rng = rng[0]
            aug_rng, dropout_rng = jax.random.split(rng)
            gb = _augment(gb, aug_rng, self.p)

            def loss_of(p_):
                out = self._apply(p_, state.batch_stats, gb,
                                  deterministic=False,
                                  rngs={"dropout": dropout_rng}, mutable=True)
                scores, mut = out
                return self.loss_fn(scores, gb), (scores, mut.get("batch_stats", {}))

            (loss, (scores, new_bs)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            # sync-BN makes new_bs identical on every device already; pmean is
            # a cheap no-op that also covers the per-device-BN mode.
            new_bs = jax.lax.pmean(new_bs, axis)
            state.opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = jax.tree_util.tree_map(lambda a, u: a + u,
                                                state.params, updates)
            new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
            return new_state, loss, scores[None]

        def eval_core(state: TrainState, gb: GraphBatch):
            gb = jax.tree_util.tree_map(lambda x: x[0], gb)
            scores = self._apply(state.params, state.batch_stats, gb,
                                 deterministic=True)
            loss = jax.lax.pmean(self.loss_fn(scores, gb), axis)
            return scores[None], loss

        self._train_step = jax.jit(shard_map(
            train_core, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P()),
            out_specs=(P(), P(), P(axis))))
        self._eval_step = jax.jit(shard_map(
            eval_core, mesh=mesh, in_specs=(P(), P(axis)),
            out_specs=(P(axis), P())))

    # epoch loops reuse Trainer's, but metrics need flattened stacked batches
    def train_epoch(self, state: TrainState, loader, epoch: int):
        from ..train.trainer import _MetricAccumulator
        p = self.p
        key = jax.random.PRNGKey((p.seed * 100003 + epoch) & 0x7FFFFFFF)
        acc = _MetricAccumulator(self.task)
        lr = jnp.asarray(self.scheduler.lr, jnp.float32)
        d = self.mesh.shape["dp"]
        for gb in loader:
            key, sub = jax.random.split(key)
            rngs = jax.random.split(sub, d)
            state, loss, scores = self._train_step(state, gb, rngs, lr)
            acc.add(_flatten_stacked(gb), _flatten_stacked(np.asarray(scores)),
                    float(loss))
        return state, acc.result()

    def evaluate(self, state: TrainState, loader):
        from ..train.trainer import _MetricAccumulator
        acc = _MetricAccumulator(self.task)
        for gb in loader:
            scores, loss = self._eval_step(state, gb)
            acc.add(_flatten_stacked(gb), _flatten_stacked(np.asarray(scores)),
                    float(loss))
        return acc.result()
