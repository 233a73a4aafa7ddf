from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import make_dp_train_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "make_dp_train_step",
]
