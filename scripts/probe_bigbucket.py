import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from probe_cobucket import make_ctx
from hept_tpu.ops.bucket_attn import static_hash, static_bucket_plan

ctx = make_ctx(60000)
d_model = ctx["h"].shape[1]; cd = ctx["cp"].shape[1]
ev = ctx["ev"]; p = ev.pairs; cid = ev.cluster_ids
pos = (cid[p[0]] == cid[p[1]]) & (cid[p[0]] > 0)
I, J = p[0][pos], p[1][pos]

for n_rounds in (8, 12):
    alpha = jax.random.normal(jax.random.PRNGKey(1), (1, d_model + cd, n_rounds))
    hashed = static_hash(ctx["h"].T, ctx["cp"].T, alpha, ctx["scale"], "x0")
    codes = ctx["codes"][:, 0]
    reps = -(-n_rounds // codes.shape[0])
    codes = jnp.tile(codes, (reps, 1))[:n_rounds]
    _, inv, _ = static_bucket_plan(hashed, codes, ctx["invalid"], ctx["cp"].T)
    invn = np.asarray(inv[:, 0])
    for block in (100, 128, 200, 256, 384, 512):
        bucket = invn // block
        same = bucket[:, I] == bucket[:, J]
        # cumulative OR recall at 2-round and 3-round per-layer widths
        r2 = float(same[:2].any(0).mean())
        r3 = float(same[:3].any(0).mean())
        ru = float(same.any(0).mean())
        print(f"rounds={n_rounds:2d} block={block:3d}: OR2={r2:.4f} OR3={r3:.4f} union={ru:.4f}", flush=True)
