from .mesh import make_mesh, batch_sharding, replicated_sharding
from .dp import make_dp_train_step
from .tp import make_tp_train_step, head_param_specs, place_variables
from .bp import make_bucket_sharded_attention

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "make_dp_train_step",
    "make_tp_train_step",
    "head_param_specs",
    "place_variables",
    "make_bucket_sharded_attention",
]
