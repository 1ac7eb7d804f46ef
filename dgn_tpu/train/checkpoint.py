"""Checkpoint / resume: params, opt state, batch stats, scheduler, epoch.

The reference has NO checkpointing — `start_epoch = 0` is hardcoded and
training state lives only in memory for up to `max_time` hours
(reference main_molecules.py:92; SURVEY.md §5).  This subsystem adds the
standard multi-host-JAX practice: atomic per-epoch snapshots with
keep-last-k rotation, plus full restore of the plateau-LR scheduler so a
resumed run continues the exact LR trajectory.

Format: one .npz of flattened array leaves (works for any TrainState pytree)
+ a JSON sidecar with treedef metadata and host-side scheduler state.
Writes are atomic (tmp + rename) so a killed run never leaves a torn file.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(state) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


class Checkpointer:
    """Directory of ckpt_{epoch:06d}.npz(.json); keeps the newest `keep`."""

    def __init__(self, directory: str, keep: int = 3, every: int = 1):
        self.dir = directory
        self.keep = keep
        self.every = max(1, every)
        os.makedirs(directory, exist_ok=True)

    # ----------------------------------------------------------------- save
    def save(self, epoch: int, state, scheduler=None) -> Optional[str]:
        if epoch % self.every != 0:
            return None
        leaves, _ = _flatten(state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        meta = {"epoch": int(epoch), "n_leaves": len(leaves)}
        if scheduler is not None:
            meta["scheduler"] = {
                "lr": scheduler.lr,
                # json encodes inf as the (python-readable) literal Infinity
                "best": float(scheduler.best),
                "num_bad": scheduler.num_bad,
            }
        base = os.path.join(self.dir, f"ckpt_{epoch:06d}")
        tmp = base + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, base + ".npz")
        with open(base + ".tmp.json", "w") as f:
            json.dump(meta, f)
        os.replace(base + ".tmp.json", base + ".json")
        self._rotate()
        return base + ".npz"

    def _rotate(self):
        snaps = self.list()
        for ep in snaps[:-self.keep]:
            for ext in (".npz", ".json"):
                try:
                    os.remove(os.path.join(self.dir, f"ckpt_{ep:06d}{ext}"))
                except OSError:
                    pass

    # -------------------------------------------------------------- restore
    def list(self):
        eps = []
        for fn in os.listdir(self.dir):
            if fn.startswith("ckpt_") and fn.endswith(".json"):
                try:
                    eps.append(int(fn[5:11]))
                except ValueError:
                    pass
        return sorted(eps)

    def latest_epoch(self) -> Optional[int]:
        snaps = self.list()
        return snaps[-1] if snaps else None

    def restore(self, example_state, epoch: Optional[int] = None,
                scheduler=None):
        """Rebuild a TrainState shaped like `example_state` (used only for
        its treedef) from the newest (or given-epoch) snapshot.  Restores
        scheduler state in place when given.  Returns (state, next_epoch)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        base = os.path.join(self.dir, f"ckpt_{epoch:06d}")
        with open(base + ".json") as f:
            meta = json.load(f)
        data = np.load(base + ".npz")
        leaves, treedef = _flatten(example_state)
        if meta["n_leaves"] != len(leaves):
            raise ValueError(
                f"checkpoint has {meta['n_leaves']} leaves, model expects "
                f"{len(leaves)} — architecture changed since the snapshot")
        new_leaves = []
        for i, old in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if np.shape(old) != arr.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != model shape "
                    f"{np.shape(old)}")
            new_leaves.append(jax.numpy.asarray(arr))
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        if scheduler is not None and "scheduler" in meta:
            s = meta["scheduler"]
            scheduler.lr = s["lr"]
            scheduler.best = float(s["best"])
            scheduler.num_bad = s["num_bad"]
        return state, meta["epoch"] + 1
