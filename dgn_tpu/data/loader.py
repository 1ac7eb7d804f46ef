"""Host-side batch loader: shuffle -> pack into fixed-shape GraphBatch buckets.

Replaces torch DataLoader + reference collate (main_molecules.py:97-99).
Packing happens on the host per batch (numpy); the bucket shape is fixed per
loader so XLA compiles each step exactly once.  This is the seam where the C++
packer (dgn_tpu/runtime) plugs in.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..graph import (GraphBatch, GraphData, bucket_sizes_for,
                     mxu_bucket_sizes, mxu_ext_caps, mxu_pair_pad,
                     mxu_pairs_needed, pack_graphs, pack_requirements,
                     round_up, typical_bucket_sizes)


def _worst_geometry(graphs, batch_size: int, layout: str):
    if layout == "mxu":
        n_pad, e_pad, _ = mxu_bucket_sizes(graphs, batch_size)
        return n_pad, e_pad
    return bucket_sizes_for(graphs, batch_size)


def _exact_geometry(graphs, batch_size: int, layout: str):
    """Max requirement over the FIXED (unshuffled) batch partition — exact
    for shuffle=False loaders, where every epoch draws the same chunks."""
    need_n = need_e = 1
    for i in range(0, len(graphs), batch_size):
        n_used, e_used = pack_requirements(graphs[i:i + batch_size],
                                           mxu_layout=layout == "mxu")
        need_n = max(need_n, n_used)
        need_e = max(need_e, e_used)
    return round_up(need_n + 1, 128), round_up(need_e, 128)


def _order_for_layout(batch, layout: str):
    """mxu: descending num_nodes — block placement is order-sensitive
    (next-fit), and every geometry estimate simulates descending order.
    Within-batch graph order is the loader's to choose; metrics accumulate
    per-graph scores, so composition order never matters."""
    if layout == "mxu":
        return sorted(batch, key=lambda g: -g.num_nodes)
    return batch


def _escape_pack(batch, layout: str, g_pad: int, base_n: int, base_e: int):
    """Repack an oversized batch at its EXACT requirement (never fails),
    rounded coarsely so repeated escapes reuse a handful of shapes."""
    n_req, e_req = pack_requirements(batch, mxu_layout=layout == "mxu")
    n_pad = round_up(max(n_req + 1, base_n), 512)
    e_pad = round_up(max(e_req, base_e), 512)
    pair_pad = (round_up(mxu_pairs_needed(batch), 64)
                if layout == "mxu" else None)
    return pack_graphs(batch, n_pad=n_pad, e_pad=e_pad, g_pad=g_pad,
                       mxu_layout=layout == "mxu", n_pairs_pad=pair_pad,
                       ext_caps="batch")


class BucketedLoader:
    """Size-bucketed batching: K compiled shapes instead of 1 worst-case shape.

    `BatchLoader` sizes one (n_pad, e_pad) bucket so that ANY shuffled subset
    of `batch_size` graphs fits — the sum of the `batch_size` LARGEST graphs.
    On size-skewed datasets that wastes node/edge slots on every batch that
    happens to draw small graphs.  This loader explores the other end of the
    padding-vs-recompilation tradeoff (SURVEY §7 hard part 6): graphs are
    partitioned into `n_buckets` size classes (equal-count quantiles by node
    count), each class gets its own tight bucket geometry, and batches are
    drawn class-homogeneously.  XLA compiles each step once per distinct
    shape — n_buckets compilations total, amortised over the whole run.

    Semantics notes:
      * eval metrics are EXACTLY preserved — the metric accumulators weight
        by real node/edge/graph counts, never by batch count or pad shape;
      * training dynamics differ slightly from uniform shuffling (batches
        contain similar-size graphs, so per-batch BatchNorm statistics and
        snorm distributions shift).  The reference shuffles uniformly, so
        this stays opt-in (`--n_buckets`, default 1).
      * `DataParams.geometry` does not apply here: every bucket always uses
        its own per-bucket worst-case bound (already tight, since buckets
        hold similar-size graphs).
    """

    def __init__(self, graphs: Sequence[GraphData], batch_size: int,
                 n_buckets: int = 4, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, layout: str = "flat"):
        if layout not in ("flat", "mxu"):
            raise ValueError(f"unknown layout {layout!r}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.layout = layout
        self.n_escapes = 0
        self.g_pad = (round_up(batch_size, 128) if layout == "mxu"
                      else batch_size)
        graphs = list(graphs)
        # at least one full batch per bucket, else buckets are pure overhead
        n_buckets = max(1, min(n_buckets, len(graphs) // max(batch_size, 1)))
        order = np.argsort([g.num_nodes for g in graphs], kind="stable")
        splits = np.array_split(order, n_buckets)
        self.buckets: List[List[GraphData]] = []
        self.geometry: List[tuple] = []   # (n_pad, e_pad) per bucket
        for part in splits:
            if len(part) == 0:
                continue
            gs = [graphs[int(j)] for j in part]
            if layout == "mxu":
                n_pad, e_pad, _ = mxu_bucket_sizes(gs, batch_size)
                pair_pad = mxu_pair_pad(gs, batch_size, n_pad, e_pad)
                ext = mxu_ext_caps(gs)
            else:
                n_pad, e_pad = bucket_sizes_for(gs, batch_size)
                pair_pad = ext = None
            self.buckets.append(gs)
            self.geometry.append((n_pad, e_pad))
            self.pair_pads = getattr(self, "pair_pads", [])
            self.pair_pads.append(pair_pad)
            self.ext_caps = getattr(self, "ext_caps", [])
            self.ext_caps.append(ext)

    def __len__(self):
        total = 0
        for gs in self.buckets:
            n = len(gs)
            total += (n // self.batch_size if self.drop_last
                      else (n + self.batch_size - 1) // self.batch_size)
        return total

    def padding_stats(self) -> dict:
        """Expected node/edge slot efficiency over one epoch (real / padded)."""
        real_n = real_e = pad_n = pad_e = 0
        for gs, (n_pad, e_pad) in zip(self.buckets, self.geometry):
            n_batches = (len(gs) // self.batch_size if self.drop_last
                         else (len(gs) + self.batch_size - 1)
                         // self.batch_size)
            if self.drop_last:
                gs = gs[:n_batches * self.batch_size]
            real_n += sum(g.num_nodes for g in gs)
            real_e += sum(g.num_edges for g in gs)
            pad_n += n_batches * n_pad
            pad_e += n_batches * e_pad
        return {"node_slot_efficiency": real_n / max(pad_n, 1),
                "edge_slot_efficiency": real_e / max(pad_e, 1),
                "n_buckets": len(self.buckets),
                "geometry": list(self.geometry)}

    def __iter__(self):
        plan = []  # (bucket_id, index array into that bucket)
        for b, gs in enumerate(self.buckets):
            idx = np.arange(len(gs))
            if self.shuffle:
                self.rng.shuffle(idx)
            bs = self.batch_size
            for i in range(0, len(idx), bs):
                chunk = idx[i:i + bs]
                if self.drop_last and len(chunk) < bs:
                    break
                plan.append((b, chunk))
        if self.shuffle:
            self.rng.shuffle(plan)
        for b, chunk in plan:
            gs = self.buckets[b]
            n_pad, e_pad = self.geometry[b]
            batch = _order_for_layout([gs[int(j)] for j in chunk],
                                      self.layout)
            try:
                yield pack_graphs(batch,
                                  n_pad=n_pad, e_pad=e_pad, g_pad=self.g_pad,
                                  mxu_layout=self.layout == "mxu",
                                  n_pairs_pad=self.pair_pads[b],
                                  ext_caps=self.ext_caps[b])
            except ValueError:
                self.n_escapes += 1
                yield _escape_pack(batch, self.layout, self.g_pad,
                                   n_pad, e_pad)


class BatchLoader:
    def __init__(self, graphs: Sequence[GraphData], batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 n_pad: Optional[int] = None, e_pad: Optional[int] = None,
                 drop_last: bool = False,
                 layout: Optional[str] = None,
                 geometry: str = "worst",
                 cache: bool = False,
                 micro_batches: int = 1):
        """layout: 'flat' (default) | 'mxu' — see graph.pack_graphs.

        cache: unshuffled loaders only — pack each batch ONCE and replay the
        same GraphBatch objects every epoch.  Saves the host repack AND lets
        Trainer.evaluate key its edge-context cache on batch identity (eval
        batches are fixed across epochs; the context is batch-constant).

        micro_batches (K > 1): yield each batch as a LIST of K identically-
        shaped GraphBatches of ~batch_size/K graphs each (round-robin dealt
        after size ordering, so sizes balance).  The Trainer runs them inside
        one jitted step with gradient accumulation (one optimizer update,
        exact full-batch loss semantics — Trainer._micro_batched).  Why: the
        packed step's per-edge cost RISES beyond ~1024 graphs/chip
        (BENCH_r04 batch_sweep), so large configured batches (PCBA's 2048)
        otherwise run a silently degraded regime.

        geometry (used only when n_pad/e_pad are not given explicitly):
          'worst'   — any-subset bound (sum of the batch_size largest graphs);
                      every batch fits by construction.
          'typical' — sized for typical shuffled batches
                      (graph.typical_bucket_sizes); a rare oversized batch is
                      repacked at the worst-case shape (one extra compile) —
                      results are identical either way, padded slots carry no
                      data.  On ZINC-shaped data this halves edge slots, and
                      under the MXU layout padded edge slots cost real
                      matmul compute.
          Unshuffled loaders always take the EXACT max over their fixed
          batch partition (tighter than both, zero overflow risk)."""
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        if layout is None:
            layout = "flat"
        if layout not in ("flat", "mxu"):
            raise ValueError(f"unknown layout {layout!r}")
        if geometry not in ("worst", "typical"):
            raise ValueError(f"unknown geometry {geometry!r}")
        self.layout = layout
        self.micro_batches = max(int(micro_batches), 1)
        # geometry is per MICRO batch (each packed unit holds micro graphs)
        micro = -(-batch_size // self.micro_batches)
        self.micro_size = micro
        self.g_pad = (round_up(micro, 128) if layout == "mxu" else micro)
        self.n_escapes = 0
        if n_pad is None or e_pad is None:
            if not shuffle and self.micro_batches == 1:
                n_pad_auto, e_pad_auto = _exact_geometry(
                    self.graphs, micro, layout)
            elif geometry == "typical":
                n_pad_auto, e_pad_auto = typical_bucket_sizes(
                    self.graphs, micro, mxu_layout=layout == "mxu",
                    seed=seed)
            else:
                n_pad_auto, e_pad_auto = _worst_geometry(
                    self.graphs, micro, layout)
            n_pad = n_pad if n_pad is not None else n_pad_auto
            e_pad = e_pad if e_pad is not None else e_pad_auto
        self.n_pad, self.e_pad = n_pad, e_pad
        self.pair_pad = (mxu_pair_pad(self.graphs, micro, n_pad, e_pad)
                         if layout == "mxu" else None)
        # loader-stable static extremes metadata (same pads => same treedef)
        self.ext = mxu_ext_caps(self.graphs) if layout == "mxu" else None
        self.drop_last = drop_last
        self.cache = cache and not shuffle
        self._cached: Optional[List[GraphBatch]] = None
        # pack_graphs auto-routes through the native C++ packer (runtime/)
        # when the library is built; no per-loader switch needed.

    def __len__(self):
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _pack_one(self, batch):
        try:
            return pack_graphs(batch, n_pad=self.n_pad, e_pad=self.e_pad,
                               g_pad=self.g_pad,
                               mxu_layout=self.layout == "mxu",
                               n_pairs_pad=self.pair_pad,
                               ext_caps=self.ext)
        except ValueError:
            # tight-geometry escape: repack at the batch's exact need
            # (the 'worst-case' estimate is NOT a true bound under the
            # mxu layout — block placement is order-sensitive)
            self.n_escapes += 1
            return _escape_pack(batch, self.layout, self.g_pad,
                                self.n_pad, self.e_pad)

    def _pack_micros(self, batch):
        """batch (already size-ordered) -> list of K identically-shaped
        GraphBatches, round-robin dealt so per-micro sizes balance.  All
        micros of one super-batch MUST share static layout metadata (the
        trainer stacks them for lax.scan): normal packs share the loader's
        ext caps; overflow escapes repack EVERY micro at one shared coarse
        geometry with the always-valid default ext metadata."""
        parts = [batch[k::self.micro_batches]
                 for k in range(self.micro_batches)]
        parts = [p for p in parts if p]
        try:
            gbs = [pack_graphs(p, n_pad=self.n_pad, e_pad=self.e_pad,
                               g_pad=self.g_pad,
                               mxu_layout=self.layout == "mxu",
                               n_pairs_pad=self.pair_pad,
                               ext_caps=self.ext) for p in parts]
        except ValueError:
            self.n_escapes += 1
            n_req = e_req = 1
            for p in parts:
                n, e = pack_requirements(p, mxu_layout=self.layout == "mxu")
                n_req, e_req = max(n_req, n), max(e_req, e)
            n_pad = round_up(max(n_req + 1, self.n_pad), 512)
            e_pad = round_up(max(e_req, self.e_pad), 512)
            pair_pad = (round_up(max(mxu_pairs_needed(p) for p in parts), 64)
                        if self.layout == "mxu" else None)
            gbs = [pack_graphs(p, n_pad=n_pad, e_pad=e_pad, g_pad=self.g_pad,
                               mxu_layout=self.layout == "mxu",
                               n_pairs_pad=pair_pad, ext_caps=None)
                   for p in parts]
        return gbs

    def __iter__(self):
        if self._cached is not None:
            yield from self._cached
            return
        out = [] if self.cache else None
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        for i in range(0, len(idx), bs):
            chunk = idx[i:i + bs]
            if self.drop_last and len(chunk) < bs:
                break
            batch = _order_for_layout([self.graphs[j] for j in chunk],
                                      self.layout)
            gb = (self._pack_one(batch) if self.micro_batches == 1
                  else self._pack_micros(batch))
            if out is not None:
                out.append(gb)
            yield gb
        if out is not None:
            self._cached = out
