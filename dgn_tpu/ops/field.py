"""Vector-field (eigenvector) augmentations — jittable, load-bearing for accuracy.

Reference:
  * elementwise random sign flip of the whole eig matrix
    (train_molecules_graph_regression.py:29-33; note it is per-ELEMENT, not
    per-eigenvector — reproduced faithfully);
  * per-node random rotation of the (eig1, eig2) plane by <= max_angle degrees
    (train_superpixels_graph_classification.py:29-37);
  * per-element sign flip of eig2 only (superpixels :38-42);
  * additive distortion: col += dist * mean(|col|)
    (superpixels :44-48; the reference's second assignment line has a latent
    broadcast bug — we implement the intended per-column form).

All take explicit PRNG keys; means are over real nodes only (mask).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sign_flip(eig: jax.Array, key: jax.Array) -> jax.Array:
    """Elementwise random +-1 flip of all eig entries."""
    s = jnp.where(jax.random.uniform(key, eig.shape) >= 0.5, 1.0, -1.0)
    return eig * s


def sign_flip_column(eig: jax.Array, key: jax.Array, col: int = 2) -> jax.Array:
    s = jnp.where(jax.random.uniform(key, (eig.shape[0],)) >= 0.5, 1.0, -1.0)
    return eig.at[:, col].set(eig[:, col] * s)


def rotate_field(eig: jax.Array, key: jax.Array, max_degrees: float,
                 cols=(1, 2)) -> jax.Array:
    """Per-node rotation of the (cols[0], cols[1]) plane by a random angle in
    [-max_degrees, max_degrees]; uses the reference's sin/cos construction
    (cos = sqrt(1 - sin^2))."""
    n = eig.shape[0]
    angle = (jax.random.uniform(key, (n,)) - 0.5) * 2 * max_degrees
    sine = jnp.sin(angle * jnp.pi / 180.0)
    cos = jnp.sqrt(1.0 - sine ** 2)
    a, b = cols
    e1, e2 = eig[:, a], eig[:, b]
    out = eig.at[:, a].set(cos * e1 + sine * e2)
    out = out.at[:, b].set(cos * e2 - sine * e1)
    return out


def distort_field(eig: jax.Array, key: jax.Array, amount: float,
                  cols=(1, 2), node_mask: Optional[jax.Array] = None) -> jax.Array:
    """col += dist_v * mean(|col|) with per-node dist in [-amount, amount]."""
    n = eig.shape[0]
    dist = (jax.random.uniform(key, (n,)) - 0.5) * 2 * amount
    out = eig
    for c in cols:
        col = eig[:, c]
        if node_mask is not None:
            m = node_mask.astype(col.dtype)
            mean_abs = jnp.sum(jnp.abs(col) * m) / jnp.maximum(jnp.sum(m), 1.0)
        else:
            mean_abs = jnp.mean(jnp.abs(col))
        out = out.at[:, c].set(out[:, c] + dist * mean_abs)
    return out
