from .hashing import e2lsh_init, e2lsh_project, lsh_mapping
from .regions import get_regions, quantile_partition, region_codes
from .buckets import (
    bit_shift,
    invert_permutation,
    grouped_sort_carry,
    sort_to_buckets,
    unsort_from_buckets,
)
from .padding import pad_to_multiple, ceil_to_multiple, replication_pad_plan

__all__ = [
    "e2lsh_init",
    "e2lsh_project",
    "lsh_mapping",
    "get_regions",
    "quantile_partition",
    "region_codes",
    "bit_shift",
    "invert_permutation",
    "grouped_sort_carry",
    "sort_to_buckets",
    "unsort_from_buckets",
    "pad_to_multiple",
    "ceil_to_multiple",
    "replication_pad_plan",
]
