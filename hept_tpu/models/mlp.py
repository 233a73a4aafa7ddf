"""Linear / MLP building blocks with torch-compatible initialization.

The reference model is tiny (h_dim=24, ~100k params) and its training
dynamics are sensitive to init scale — in particular `w_rpe`, whose entries go
through `exp(sum(...))` to become RBF widths (reference
src/models/attention/hept.py:36-43). We therefore replicate
`torch.nn.Linear`'s default init (kaiming_uniform(a=√5) ≡ U(±1/√fan_in) for
both kernel and bias) instead of flax defaults.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def bounded_uniform(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear default init.

    Kernel is stored flax-style (in, out); the checkpoint converter
    (utils/convert.py) transposes torch (out, in) weights on import.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", bounded_uniform(bound), (in_features, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", bounded_uniform(bound), (self.features,))
            y = y + bias
        return y


class OutMLP(nn.Module):
    """The reference's output head MLP (PyG `MLP`, transformer.py:92-100):

    5 layers, hidden 256, LayerNorm (node mode) + tanh after every layer
    except the plain last one. PyG order is lin -> norm -> act.
    """

    out_features: int
    hidden: int = 256
    num_layers: int = 5

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers - 1):
            x = TorchLinear(self.hidden)(x)
            x = nn.LayerNorm()(x)
            x = jnp.tanh(x)
        return TorchLinear(self.out_features)(x)


class FeedForward(nn.Module):
    """Per-block FF: Linear -> ReLU -> Linear (reference transformer.py:198-202)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.features)(x)
        x = nn.relu(x)
        return TorchLinear(self.features)(x)


class KernelOnly(nn.Module):
    """Declare a TorchLinear-compatible kernel parameter WITHOUT computing
    the projection — same param path ("<name>/kernel") and init as
    `TorchLinear(features, use_bias=False)`, for paths that apply the
    projection elsewhere (post-sort q/k/v in HEPT, ops/bucket_attn.py
    hept_attention_core_xcols)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        bound = 1.0 / math.sqrt(in_features)
        return self.param(
            "kernel", bounded_uniform(bound), (in_features, self.features)
        )
