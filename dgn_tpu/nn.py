"""Shared NN primitives: FCLayer / MLP / MLPReadout / masked BatchNorm.

Functional flax.linen re-design of the reference torch modules
(/root/reference/realworld_benchmark/nets/layers.py,
 /root/reference/realworld_benchmark/nets/mlp_readout_layer.py), with two
TPU-specific deltas:

  * BatchNorm is *masked*: statistics are computed over real nodes only, so
    padding can never pollute them (the reference operates on unpadded dynamic
    node batches, nets/layers.py:101-112).  Running stats follow torch
    BatchNorm1d semantics (biased var to normalize, unbiased var into the
    running buffer, momentum 0.1, eps 1e-5).
  * Initializers reproduce the reference distributions exactly:
    FCLayer uses xavier_uniform with gain = 1/in_size and zero bias
    (nets/layers.py:96-99 `init_fn(self.linear.weight, 1/self.in_size)`);
    plain Linears use torch's default kaiming-uniform/bias scheme.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

# ------------------------------------------------------------------ inits

def xavier_uniform_gain(gain: float):
    """U(-a, a), a = gain*sqrt(6/(fan_in+fan_out)); torch xavier_uniform_."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)
    return init


def fc_weight_init(in_size: int):
    """The reference FCLayer init: xavier_uniform with gain = 1/in_size."""
    return xavier_uniform_gain(1.0 / in_size)


def torch_linear_weight_init():
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) -> U(-1/sqrt(fan_in), .)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# -------------------------------------------------------------- activations

def _glu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


ACTIVATIONS: dict[str, Optional[Callable]] = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "glu": _glu,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),  # torch default slope
    "softplus": jax.nn.softplus,
    "none": None,
}


def get_activation(name) -> Optional[Callable]:
    """String -> activation fn (reference nets/layers.py:7-18 semantics)."""
    if name is None:
        return None
    if callable(name):
        return name
    key = str(name).lower()
    if key not in ACTIVATIONS:
        raise ValueError(f"unsupported activation {name!r}")
    return ACTIVATIONS[key]


# ------------------------------------------------------------- batch norm

class MaskedBatchNorm(fnn.Module):
    """torch BatchNorm1d over the node axis, masked for padding.

    use_running_average=True -> eval mode (running stats).
    Mask semantics: only rows with mask True contribute to batch statistics;
    all rows are normalized (padded rows produce garbage that stays masked).

    axis_name: when set (inside shard_map/pmap over that axis), statistics are
    psum'd across devices — sync-BN, which makes data-parallel training
    bitwise-consistent with the single-device run (SURVEY.md §7 hard part #5).
    """
    features: int
    momentum: float = 0.1          # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @fnn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 use_running_average: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        scale = self.param("scale", lambda k, s: jnp.ones(s, jnp.float32),
                           (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32),
                          (self.features,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                m = jnp.ones((x.shape[0], 1), x.dtype)
            else:
                m = mask.astype(x.dtype)[:, None]
            count = jnp.sum(m)
            s1 = jnp.sum(x * m, axis=0)
            s2 = jnp.sum(jnp.square(x) * m, axis=0)
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = s1 / count
            var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


# ------------------------------------------------------------------ layers

class Linear(fnn.Module):
    """torch.nn.Linear with torch default init (for MLPReadout / embeddings)."""
    features: int
    use_bias: bool = True

    @fnn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("kernel", torch_linear_weight_init(), (in_f, self.features))
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", torch_linear_bias_init(in_f), (self.features,))
            y = y + b
        return y


class FCLayer(fnn.Module):
    """Dense -> activation -> dropout -> batchnorm, in that exact order
    (reference nets/layers.py:101-112 — BN after dropout is a quirk we keep)."""
    out_size: int
    activation: str = "relu"
    dropout: float = 0.0
    b_norm: bool = False
    use_bias: bool = True
    bn_axis: Optional[str] = None

    @fnn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        in_f = x.shape[-1]
        w = self.param("kernel", fc_weight_init(in_f), (in_f, self.out_size))
        h = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", fnn.initializers.zeros, (self.out_size,))
            h = h + b
        act = get_activation(self.activation)
        if act is not None:
            h = act(h)
        if self.dropout > 0.0:
            h = fnn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        if self.b_norm:
            h = MaskedBatchNorm(self.out_size, axis_name=self.bn_axis)(
                h, mask=mask, use_running_average=deterministic)
        return h


class MLP(fnn.Module):
    """Stack of FCLayers (reference nets/layers.py:120-155)."""
    hidden_size: int
    out_size: int
    layers: int
    mid_activation: str = "relu"
    last_activation: str = "none"
    dropout: float = 0.0
    mid_b_norm: bool = False
    last_b_norm: bool = False
    bn_axis: Optional[str] = None

    @fnn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if self.layers <= 1:
            return FCLayer(self.out_size, self.last_activation, self.dropout,
                           self.last_b_norm, bn_axis=self.bn_axis)(
                               x, mask, deterministic)
        x = FCLayer(self.hidden_size, self.mid_activation, self.dropout,
                    self.mid_b_norm, bn_axis=self.bn_axis)(x, mask, deterministic)
        for _ in range(self.layers - 2):
            x = FCLayer(self.hidden_size, self.mid_activation, self.dropout,
                        self.mid_b_norm, bn_axis=self.bn_axis)(x, mask, deterministic)
        return FCLayer(self.out_size, self.last_activation, self.dropout,
                       self.last_b_norm, bn_axis=self.bn_axis)(x, mask, deterministic)


class _FCLayerParams(fnn.Module):
    """Declares the {kernel, bias} params of an FCLayer without computing it."""
    in_size: int
    out_size: int

    @fnn.compact
    def __call__(self):
        k = self.param("kernel", fc_weight_init(self.in_size),
                       (self.in_size, self.out_size))
        b = self.param("bias", fnn.initializers.zeros, (self.out_size,))
        return k, b


class LinearParams(fnn.Module):
    """Parameter-holder with the exact pytree of MLP(layers=1): child
    FCLayer_0 owning {kernel, bias}.

    The decomposed DGN hot path (layers/dgn.py) needs the raw weight matrix —
    a linear pretrans splits as h@W1 + h@W2 + b across edge endpoints, and a
    linear posttrans commutes with the per-node degree scalers — while
    checkpoints and reference-parity mappings must keep seeing the legacy
    `pretrans/FCLayer_0/kernel` paths.  Same names, same init distribution,
    same shapes; only the computation moves out of the module.
    """
    in_size: int
    out_size: int

    @fnn.compact
    def __call__(self):
        return _FCLayerParams(self.in_size, self.out_size, name="FCLayer_0")()


class MLPReadout(fnn.Module):
    """L hidden Linears (halving dims or constant) + ReLU, final Linear
    (reference nets/mlp_readout_layer.py:13-30)."""
    output_dim: int
    L: int = 2
    decreasing_dim: bool = True

    @fnn.compact
    def __call__(self, x):
        input_dim = x.shape[-1]
        y = x
        for l in range(self.L):
            feat = input_dim // 2 ** (l + 1) if self.decreasing_dim else input_dim
            y = Linear(feat)(y)
            y = jax.nn.relu(y)
        return Linear(self.output_dim)(y)


class Embedding(fnn.Module):
    """torch.nn.Embedding parity: weights ~ N(0, 1).

    Small vocabularies look up via a one-hot matmul: on TPU the backward of
    jnp.take is a scatter-add that costs ~per-row, while the matmul's
    backward is MXU work (ops/mxu.py rationale).
    """
    num_embeddings: int
    features: int

    @fnn.compact
    def __call__(self, ids):
        table = self.param("embedding", fnn.initializers.normal(stddev=1.0),
                           (self.num_embeddings, self.features))
        if self.num_embeddings <= 256 and ids.ndim == 1:
            from .ops.mxu import onehot_embed
            return onehot_embed(ids, table)
        return jnp.take(table, ids, axis=0)
