"""PNA-style degree scalers.

Reference: /root/reference/realworld_benchmark/nets/scalers.py (identity /
amplification / attenuation over the true in-degree D with training-set average
avg_d['log']), plus the linear/inverse-linear pair that only exists on the dense
research path (/root/reference/models/pytorch/scalers.py:27-38, avg_d['lin']).

`D` here is the per-node true in-degree carried in GraphBatch — the exact value
the reference reads off the mailbox depth (nets/dgn_layer.py:96).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def scale_identity(h, deg, avg_d):
    return h

def scale_amplification(h, deg, avg_d):
    # h * log(D+1)/avg_d['log']  (reference nets/scalers.py:11-13)
    return h * (jnp.log(deg + 1.0) / avg_d["log"])[:, None]

def scale_attenuation(h, deg, avg_d):
    # h * avg_d['log']/log(D+1)  (reference nets/scalers.py:16-18).
    # Degree-0 nodes would divide by log(1)=0; DGL never reduces deg-0 nodes, so
    # their aggregated h is 0 — keep 0 * anything = 0 by guarding the division.
    logd = jnp.log(deg + 1.0)
    return h * jnp.where(logd > 0, avg_d["log"] / jnp.maximum(logd, 1e-30), 0.0)[:, None]

def scale_linear(h, deg, avg_d):
    # h * D/avg_d['lin']  (reference models/pytorch/scalers.py:27-31)
    return h * (deg / avg_d["lin"])[:, None]

def scale_inverse_linear(h, deg, avg_d):
    return h * jnp.where(deg > 0, avg_d["lin"] / jnp.maximum(deg, 1), 0.0)[:, None]


SCALERS = {
    "identity": scale_identity,
    "amplification": scale_amplification,
    "attenuation": scale_attenuation,
    "linear": scale_linear,
    "inverse_linear": scale_inverse_linear,
}


def parse_names(names) -> list[str]:
    if isinstance(names, str):
        names = names.split()
    names = list(names)
    for n in names:
        if n not in SCALERS:
            raise KeyError(f"unknown scaler {n!r}")
    return names


def apply_scalers(names: Sequence[str], h: jax.Array, deg: jax.Array,
                  avg_d: Dict[str, float]) -> jax.Array:
    """Concat scaled copies on the feature axis.

    NOTE the reference quirk: layers only apply scalers when len(scalers)>1
    (reference nets/dgn_layer.py:95-96) — that gate lives in the layer, not here.
    """
    deg = deg.astype(h.dtype)
    outs = [SCALERS[n](h, deg, avg_d) for n in names]
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def scaler_columns(names: Sequence[str], deg: jax.Array,
                   avg_d: Dict[str, float],
                   dtype=jnp.float32) -> jax.Array:
    """[N, S] per-node scalar factor of each scaler (identity -> 1).

    Because every scaler is a per-node SCALAR multiple, row scaling commutes
    with the posttrans matmul: (s ⊙ x) @ W == s ⊙ (x @ W).  The decomposed
    layer (layers/dgn.py) uses these columns to fold the scaler concat into
    the posttrans weights instead of materializing len(scalers) scaled copies
    of the aggregated features.
    """
    deg = deg.astype(dtype)
    ones = jnp.ones_like(deg)
    return jnp.stack([SCALERS[n](ones[:, None], deg, avg_d)[:, 0]
                      for n in names], axis=1)


def degree_stats(degrees) -> Dict[str, float]:
    """avg_d over concatenated train in-degrees (reference main_molecules.py:300-304):
    lin = mean(D), exp = mean(exp(1/D) - 1), log = mean(log(D + 1)).
    """
    import numpy as np
    d = np.asarray(degrees, dtype=np.float64)
    with np.errstate(over="ignore"):   # d=0 -> inf, same as the torch formula
        exp = float(np.mean(np.exp(1.0 / np.maximum(d, 1e-30)) - 1.0))
    return {
        "lin": float(np.mean(d)),
        "exp": exp,
        "log": float(np.mean(np.log(d + 1.0))),
    }
