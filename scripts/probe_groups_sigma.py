"""Offline sigma-order sweep for transport groups: which storage order makes
g-groups tight enough in hash space to keep union co-bucket recall?"""
import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import os
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from probe_cobucket import make_ctx
from hept_tpu.ops.bucket_attn import static_hash

BLOCK = 128
N_ROUNDS = 12

ctx = make_ctx(60000)
d_model = ctx["h"].shape[1]; cd = ctx["cp"].shape[1]
alpha = jax.random.normal(jax.random.PRNGKey(1), (1, d_model + cd, N_ROUNDS))
hashed = np.asarray(static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"], "x0"))
codes = np.asarray(ctx["codes"][:, 0])  # (3, n) AND codes
reps = -(-N_ROUNDS // codes.shape[0])
codes = np.tile(codes, (reps, 1))[:N_ROUNDS]
invalid = np.asarray(ctx["invalid"])
span = hashed.max(1, keepdims=True) - hashed.min(1, keepdims=True)
key = hashed + codes * span
key[:, invalid] = 3e38
n = key.shape[1]

# two dedicated sigma projections in the same z-space (independent of rounds)
a_extra = jax.random.normal(jax.random.PRNGKey(7), (1, d_model + cd, 2))
hAB = np.asarray(static_hash(ctx["h"].T, ctx["cp"].T, a_extra, ctx["scale"], "x0"))
code0 = codes[0].copy()

ev = ctx["ev"]; p = ev.pairs; cid = ev.cluster_ids
pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)
I, J = p[0][pos], p[1][pos]

def recall_for_sigma(sigma, g):
    """sigma: natural indices in storage order. groups = consecutive g."""
    inv_sigma = np.empty(n, np.int64); inv_sigma[sigma] = np.arange(n)
    ks = key[:, sigma]                      # (c, n) keys in sigma order
    gkey = ks.reshape(N_ROUNDS, n // g, g).min(-1)
    order = np.argsort(gkey, axis=1, kind="stable")   # group sort per round
    ginv = np.empty_like(order)
    rows = np.arange(N_ROUNDS)[:, None]
    ginv[rows, order] = np.arange(n // g)[None]
    bucket = ginv[:, inv_sigma // g] // (BLOCK // g)
    same = bucket[:, I] == bucket[:, J]
    return [float(same[:k].any(0).mean()) for k in (3, 6, 12)]

def show(name, sigma, gs=(2, 4, 8)):
    for g in gs:
        r = recall_for_sigma(sigma, g)
        print(f"{name:28s} g={g}: OR3={r[0]:.4f} OR6={r[1]:.4f} union12={r[2]:.4f}", flush=True)

# baseline: round-0 key order
show("sigma=round0", np.argsort(key[0], kind="stable"))

# 2-level: code0 | chunk(hA, c1) | hB
for c1 in (16, 32, 64):
    kA = hAB[0] + code0 * (hAB[0].max() - hAB[0].min())
    kA[invalid] = 3e38
    oA = np.argsort(kA, kind="stable")
    rankA = np.empty(n, np.int64); rankA[oA] = np.arange(n)
    kB = (rankA // c1).astype(np.float64) * 1e12 + hAB[1]
    kB[invalid] = np.inf
    show(f"sigma=2lvl c1={c1}", np.argsort(kB, kind="stable"))

# eta/phi Morton order within region cells (code0 high bits)
eta, phi = np.asarray(ctx["cp"])[:, 0], np.asarray(ctx["cp"])[:, 1]
def morton(a, b, bits=10):
    qa = np.clip(((a - a.min()) / (np.ptp(a) + 1e-9) * (2**bits - 1)).astype(np.int64), 0, 2**bits - 1)
    qb = np.clip(((b - b.min()) / (np.ptp(b) + 1e-9) * (2**bits - 1)).astype(np.int64), 0, 2**bits - 1)
    out = np.zeros_like(qa)
    for i in range(bits):
        out |= ((qa >> i) & 1) << (2 * i + 1)
        out |= ((qb >> i) & 1) << (2 * i)
    return out
mk = code0 * (2.0 ** 21) + morton(eta, phi)
mk[invalid] = np.inf
show("sigma=code0|morton(eta,phi)", np.argsort(mk, kind="stable"))

# 3-level with a third projection
a3 = jax.random.normal(jax.random.PRNGKey(9), (1, d_model + cd, 3))
h3 = np.asarray(static_hash(ctx["h"].T, ctx["cp"].T, a3, ctx["scale"], "x0"))
for c1, c2 in ((64, 8), (128, 16)):
    kA = h3[0] + code0 * (h3[0].max() - h3[0].min()); kA[invalid] = 3e38
    oA = np.argsort(kA, kind="stable"); rankA = np.empty(n, np.int64); rankA[oA] = np.arange(n)
    kB = (rankA // c1).astype(np.float64) * 1e12 + h3[1]; kB[invalid] = np.inf
    oB = np.argsort(kB, kind="stable"); rankB = np.empty(n, np.int64); rankB[oB] = np.arange(n)
    kC = (rankB // c2).astype(np.float64) * 1e12 + h3[2]; kC[invalid] = np.inf
    show(f"sigma=3lvl c1={c1},c2={c2}", np.argsort(kC, kind="stable"))
