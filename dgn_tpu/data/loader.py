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
                     mxu_bucket_sizes, pack_graphs, round_up)


class BatchLoader:
    def __init__(self, graphs: Sequence[GraphData], batch_size: int,
                 shuffle: bool = False, seed: int = 0,
                 n_pad: Optional[int] = None, e_pad: Optional[int] = None,
                 drop_last: bool = False, packer=None,
                 kernel_layout: bool = False, layout: Optional[str] = None):
        """layout: 'flat' (default) | 'pallas' | 'mxu' — see graph.pack_graphs.
        kernel_layout=True is the legacy spelling of layout='pallas'."""
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        if layout is None:
            layout = "pallas" if kernel_layout else "flat"
        if layout not in ("flat", "pallas", "mxu"):
            raise ValueError(f"unknown layout {layout!r}")
        self.layout = layout
        self.g_pad = (round_up(batch_size, 128) if layout == "mxu"
                      else batch_size)
        if n_pad is None or e_pad is None:
            if layout == "mxu":
                n_pad_auto, e_pad_auto, _ = mxu_bucket_sizes(
                    self.graphs, batch_size)
            else:
                n_pad_auto, e_pad_auto = bucket_sizes_for(self.graphs,
                                                          batch_size)
            n_pad = n_pad if n_pad is not None else n_pad_auto
            e_pad = e_pad if e_pad is not None else e_pad_auto
        self.n_pad, self.e_pad = n_pad, e_pad
        self.drop_last = drop_last
        self.packer = packer  # optional native packer (runtime/)
        self.kernel_layout = layout == "pallas"

    def __len__(self):
        n = len(self.graphs)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        bs = self.batch_size
        for i in range(0, len(idx), bs):
            chunk = idx[i:i + bs]
            if self.drop_last and len(chunk) < bs:
                return
            batch = [self.graphs[j] for j in chunk]
            yield pack_graphs(batch, n_pad=self.n_pad, e_pad=self.e_pad,
                              g_pad=self.g_pad,
                              kernel_layout=self.kernel_layout,
                              mxu_layout=self.layout == "mxu")
