import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

N, H, C, BS = 60_000, 8, 3, 100
D = 30
ITERS = 5

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 4)
x = jax.random.normal(ks[0], (H, N, D))
x3 = jax.random.normal(ks[1], (H, N, 3 * D))
keys_sort = jax.random.normal(ks[2], (C, H, N))


@jax.jit
def _setup(keys_sort):
    return jnp.argsort(keys_sort, axis=-1)


perm = _setup(keys_sort)
jax.block_until_ready(perm)
print("setup done", flush=True)


def scan_time(tag, body):
    @jax.jit
    def run(s0):
        def step(s, _):
            out = body(s)
            return s + jnp.ravel(out)[0].astype(jnp.float32) * 1e-20, ()

        s, _ = jax.lax.scan(step, s0, None, length=ITERS)
        return s

    out = run(jnp.float32(1.0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(jnp.float32(1.5))
    jax.block_until_ready(out)
    print(f"{tag}: {(time.perf_counter() - t0) / ITERS * 1e3:.2f} ms", flush=True)


# (a) current formulation
def cur(s):
    xb = jnp.broadcast_to((x * s)[None], (C, H, N, D))
    return jnp.take_along_axis(xb, perm[..., None], axis=-2)


scan_time("a_take_along_axis", cur)


# (b) flat leading-axis gather
def flat(s):
    x2 = (x * s).reshape(H * N, D)
    off = (jnp.arange(H, dtype=perm.dtype) * N)[None, :, None]
    fidx = (perm + off).reshape(-1)
    return x2[fidx].reshape(C, H, N, D)


scan_time("b_flat_rows", flat)


# (c) one gather of concat(q,k,v) (3D cols)
def catgather(s):
    xb = jnp.broadcast_to((x3 * s)[None], (C, H, N, 3 * D))
    return jnp.take_along_axis(xb, perm[..., None], axis=-2)


scan_time("c_concat90", catgather)


# (d) bf16 gather
xbf = x.astype(jnp.bfloat16)


def bf16g(s):
    xb = jnp.broadcast_to((xbf * s.astype(jnp.bfloat16))[None], (C, H, N, D))
    return jnp.take_along_axis(xb, perm[..., None], axis=-2)


scan_time("d_bf16", bf16g)


# (e) transposed last-dim gather
xt = jnp.swapaxes(x, -1, -2)  # (H, D, N)


def lastdim(s):
    xb = jnp.broadcast_to((xt * s)[None], (C, H, D, N))
    return jnp.take_along_axis(xb, perm[:, :, None, :], axis=-1)


scan_time("e_lastdim", lastdim)


# (f) sort carrying payload columns (variadic sort moves data directly)
def carry_sort(s):
    # NOTE: all outputs must be consumed or XLA dead-code-eliminates the
    # payload operands and the timing is bogus (this burned us once).
    ops = [keys_sort * s] + [
        jnp.broadcast_to(x[None, :, :, i], (C, H, N)) for i in range(D)
    ]
    sorted_ops = jax.lax.sort(ops, dimension=-1, num_keys=1)
    return sum(o.sum() for o in sorted_ops)


scan_time("f_variadic_sort", carry_sort)
