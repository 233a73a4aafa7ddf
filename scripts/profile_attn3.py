import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from hept_tpu.core.buckets import invert_permutation, sort_to_buckets, unsort_from_buckets
from hept_tpu.core.hashing import lsh_mapping
from hept_tpu.ops.bucket_attn import bucket_rbf_attention_xla
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_pallas

N, H, C, BS = 60_000, 8, 3, 100
D, DV = 30, 24
NB = N // BS

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 9)
q = jax.random.normal(ks[0], (H, N, D))
k = jax.random.normal(ks[1], (H, N, D))
v = jax.random.normal(ks[2], (H, N, DV))
alpha = jax.random.normal(ks[3], (H, D, C))
codes = jax.random.randint(ks[4], (C, H, N), 0, 200).astype(jnp.float32)
keys_sort = jax.random.normal(ks[5], (C, H, N))
perm = jnp.argsort(keys_sort, axis=-1)
sq = sort_to_buckets(q, perm, BS)
sk = sort_to_buckets(k, perm, BS)
sv = sort_to_buckets(v, perm, BS)


def timeit(tag, fn, iters=10):
    # fresh scalar input defeats any value-level result caching
    f = jax.jit(fn)
    out = f(jnp.float32(1.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = f(jnp.float32(1.0 + i * 1e-6))
    jax.block_until_ready(out)
    print(tag, (time.perf_counter() - t0) / iters * 1e3, "ms", flush=True)


timeit("lsh_mapping", lambda s: lsh_mapping(alpha, q * s, k * s))
timeit("argsort24", lambda s: jnp.argsort(keys_sort * s, axis=-1))
timeit("invert_perm", lambda s: invert_permutation(jnp.argsort(keys_sort * s, axis=-1)))
timeit("gather_q", lambda s: sort_to_buckets(q * s, perm, BS))
timeit("gather3", lambda s: (sort_to_buckets(q * s, perm, BS), sort_to_buckets(k * s, perm, BS), sort_to_buckets(v * s, perm, BS)))
timeit("kernel_xla", lambda s: bucket_rbf_attention_xla(sq * s, sk * s, sv * s))
timeit("kernel_pallas", lambda s: bucket_rbf_attention_pallas(sq * s, sk * s, sv * s))
timeit("unsort", lambda s: unsort_from_buckets(sv * s, invert_permutation(perm)))
