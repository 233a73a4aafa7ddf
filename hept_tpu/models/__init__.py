from .mlp import TorchLinear, OutMLP
from .transformer import HeptTransformer, TransformerConfig, make_batched_apply

__all__ = [
    "TorchLinear",
    "OutMLP",
    "HeptTransformer",
    "TransformerConfig",
    "make_batched_apply",
]
