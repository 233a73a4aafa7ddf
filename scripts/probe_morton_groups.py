import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from probe_cobucket import make_ctx
from hept_tpu.ops.bucket_attn import static_hash

N_ROUNDS = 8
ctx = make_ctx(60000)
d_model = ctx["h"].shape[1]; cd = ctx["cp"].shape[1]
alpha = jax.random.normal(jax.random.PRNGKey(1), (1, d_model + cd, N_ROUNDS))
hashed = np.asarray(static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"], "x0"))
codes = np.asarray(ctx["codes"][:, 0])
reps = -(-N_ROUNDS // codes.shape[0]); codes = np.tile(codes, (reps, 1))[:N_ROUNDS]
invalid = np.asarray(ctx["invalid"])
span = hashed.max(1, keepdims=True) - hashed.min(1, keepdims=True)
key = hashed + codes * span
key[:, invalid] = 3e38
n = key.shape[1]
ev = ctx["ev"]; p = ev.pairs; cid = ev.cluster_ids
pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)
I, J = p[0][pos], p[1][pos]

eta, phi = np.asarray(ctx["cp"])[:, 0], np.asarray(ctx["cp"])[:, 1]
def morton(a, b, bits=10):
    qa = np.clip(((a - a.min()) / (np.ptp(a) + 1e-9) * (2**bits - 1)).astype(np.int64), 0, 2**bits - 1)
    qb = np.clip(((b - b.min()) / (np.ptp(b) + 1e-9) * (2**bits - 1)).astype(np.int64), 0, 2**bits - 1)
    out = np.zeros_like(qa)
    for i in range(bits):
        out |= ((qa >> i) & 1) << (2 * i + 1)
        out |= ((qb >> i) & 1) << (2 * i)
    return out
code0 = codes[0].copy()
mk = code0 * (2.0 ** 21) + morton(eta, phi)
mk[invalid] = np.inf
sigma = np.argsort(mk, kind="stable")
inv_sigma = np.empty(n, np.int64); inv_sigma[sigma] = np.arange(n)
ks = key[:, sigma]
for g in (2, 4):
    gkey = ks.reshape(N_ROUNDS, n // g, g).min(-1)
    order = np.argsort(gkey, axis=1, kind="stable")
    ginv = np.empty_like(order)
    rows = np.arange(N_ROUNDS)[:, None]
    ginv[rows, order] = np.arange(n // g)[None]
    for block in (128, 256, 512):
        bucket = ginv[:, inv_sigma // g] // (block // g)
        same = bucket[:, I] == bucket[:, J]
        r2 = float(same[:2].any(0).mean()); ru = float(same.any(0).mean())
        print(f"morton-sigma rounds=8 block={block} g={g}: OR2={r2:.4f} union8={ru:.4f}", flush=True)
