"""Optimizer + LR schedule with torch-parity semantics.

The reference trains every benchmark with torch.optim.Adam(weight_decay=wd) +
ReduceLROnPlateau(mode='min', factor, patience, min_lr)
(reference main_molecules.py:88-91).  Torch Adam applies weight decay as L2
added to the gradient BEFORE the moment update — optax.adamw (decoupled) would
be wrong; we chain add_decayed_weights -> scale_by_adam.  The plateau
scheduler is host-side state; the current lr is injected into the optimizer
via optax.inject_hyperparams.
"""
from __future__ import annotations

import dataclasses

import optax


def adam_l2(learning_rate: float, weight_decay: float = 0.0,
            b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch.optim.Adam(lr, weight_decay) semantics."""
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)
    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected hyperparameter in-place-ish (returns new state)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau (mode='min') parity.

    threshold=1e-4 'rel' (torch default): improvement iff
    metric < best * (1 - 1e-4).  After `patience` consecutive bad epochs, lr
    *= factor, floored at min_lr.  Step on -metric for max-mode quantities
    (the reference does scheduler.step(-val_roc), main_HIV.py:144).
    """
    lr: float
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 0.0
    threshold: float = 1e-4

    best: float = float("inf")
    num_bad: int = 0
    cooldown: int = 0

    def step(self, metric: float) -> float:
        is_better = (self.best == float("inf")
                     or metric < self.best * (1 - self.threshold))
        if is_better:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad = 0
        return self.lr

    def state_dict(self):
        return dataclasses.asdict(self)

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)
