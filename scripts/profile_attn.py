import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

from hept_tpu.core.buckets import invert_permutation, sort_to_buckets, unsort_from_buckets
from hept_tpu.core.hashing import lsh_mapping
from hept_tpu.ops.bucket_attn import bucket_rbf_attention_xla, hept_attention_core
from hept_tpu.ops.bucket_attn_pallas import bucket_rbf_attention_pallas

N, H, C, BS = 60_000, 8, 3, 100
D, DV = 30, 24
NB = N // BS


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
q = jax.random.normal(ks[0], (H, N, D))
k = jax.random.normal(ks[1], (H, N, D))
v = jax.random.normal(ks[2], (H, N, DV))
alpha = jax.random.normal(ks[3], (H, D, C))
codes = jax.random.randint(ks[4], (C, H, N), 0, 200).astype(jnp.float32)

print("full core xla:", timeit(jax.jit(lambda *a: hept_attention_core(*a, block_size=BS, impl="xla")), q, k, v, alpha, codes))
print("full core pallas:", timeit(jax.jit(lambda *a: hept_attention_core(*a, block_size=BS, impl="pallas")), q, k, v, alpha, codes))

keys_sort = jax.random.normal(ks[5], (C, H, N))


@jax.jit
def just_sort(x):
    return jnp.argsort(x, axis=-1)


print("argsort (c,h,n):", timeit(just_sort, keys_sort))

perm = just_sort(keys_sort)


@jax.jit
def just_invert(p):
    return invert_permutation(p)


print("invert_permutation:", timeit(just_invert, perm))


@jax.jit
def just_gather(x, p):
    return sort_to_buckets(x, p, BS)


print("gather q (c,h,n,d):", timeit(just_gather, q, perm))

sq = just_gather(q, perm)
sk = just_gather(k, perm)
sv = just_gather(v, perm)


@jax.jit
def just_kernel_xla(a, b, c2):
    return bucket_rbf_attention_xla(a, b, c2)


print("bucket kernel xla:", timeit(just_kernel_xla, sq, sk, sv))


@jax.jit
def just_kernel_pallas(a, b, c2):
    return bucket_rbf_attention_pallas(a, b, c2)


print("bucket kernel pallas:", timeit(just_kernel_pallas, sq, sk, sv))

den = jnp.ones((C, H, NB, BS, 1))


@jax.jit
def just_unsort(s, p):
    return unsort_from_buckets(s, p)


pinv = just_invert(perm)
print("unsort:", timeit(just_unsort, sv, pinv))


@jax.jit
def just_hash(qq, kk):
    return lsh_mapping(alpha, qq, kk)


print("lsh_mapping:", timeit(just_hash, q, k))

# model-level pieces
from hept_tpu.models.mlp import OutMLP

mlp = OutMLP(12)
vars_mlp = mlp.init(jax.random.PRNGKey(0), jnp.zeros((N, 12)))
xin = jax.random.normal(ks[6], (N, 12))
print("OutMLP:", timeit(jax.jit(lambda p, x: mlp.apply(p, x)), vars_mlp, xin))

# region computation
from hept_tpu.core.regions import get_regions, region_codes

regions = get_regions(jax.random.PRNGKey(1), 150, C, H)
coords = jax.random.normal(ks[7], (N, 6))
print("region_codes:", timeit(jax.jit(lambda cc: region_codes(cc, regions)), coords))
