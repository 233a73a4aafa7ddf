from .mlp import TorchLinear, OutMLP
from .transformer import (
    HeptTransformer,
    TransformerConfig,
    make_batched_apply,
    make_flat_batched_apply,
    stack_layer_params,
    unstack_layer_params,
)

__all__ = [
    "TorchLinear",
    "OutMLP",
    "HeptTransformer",
    "TransformerConfig",
    "make_batched_apply",
    "make_flat_batched_apply",
    "stack_layer_params",
    "unstack_layer_params",
]
