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
ITERS = 10

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 9)
q = jax.random.normal(ks[0], (H, N, D))
k = jax.random.normal(ks[1], (H, N, D))
v = jax.random.normal(ks[2], (H, N, DV))
alpha = jax.random.normal(ks[3], (H, D, C))
keys_sort = jax.random.normal(ks[5], (C, H, N))


@jax.jit
def _setup(keys_sort, q, k, v):
    perm = jnp.argsort(keys_sort, axis=-1)
    return (
        perm,
        invert_permutation(perm),
        sort_to_buckets(q, perm, BS),
        sort_to_buckets(k, perm, BS),
        sort_to_buckets(v, perm, BS),
    )


perm, perm_inv, sq, sk, sv = _setup(keys_sort, q, k, v)
jax.block_until_ready(sv)
print("setup done", flush=True)


def scan_time(tag, body):
    """body(s) -> array; chained via scalar s to prevent DCE/caching."""

    @jax.jit
    def run(s0):
        def step(s, _):
            out = body(s)
            return s + jnp.ravel(out)[0] * 1e-20, ()

        s, _ = jax.lax.scan(step, s0, None, length=ITERS)
        return s

    out = run(jnp.float32(1.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jnp.float32(1.5))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {dt:.2f} ms", flush=True)


scan_time("lsh_mapping", lambda s: lsh_mapping(alpha, q * s, k * s)[0])
scan_time("argsort24", lambda s: jnp.argsort(keys_sort * s, axis=-1))
scan_time("invert_perm", lambda s: invert_permutation(jnp.argsort(keys_sort * s, axis=-1)))
scan_time("gather_q", lambda s: sort_to_buckets(q * s, perm, BS))
scan_time("kernel_xla", lambda s: bucket_rbf_attention_xla(sq * s, sk * s, sv * s)[1])
scan_time("kernel_pallas", lambda s: bucket_rbf_attention_pallas(sq * s, sk * s, sv * s)[1])
scan_time("unsort", lambda s: unsort_from_buckets(sv * s, perm_inv))
