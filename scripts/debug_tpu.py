import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp, optax
from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig
from hept_tpu.train.losses import infonce_loss

rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=60000, avg_track_size=8, pairs_per_point=16)
b = pack_events([ev], block_size=100)
cfg = TransformerConfig(in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
    h_dim=24, num_heads=8, n_layers=4, block_size=100, n_hashes=3, num_regions=150,
    num_w_per_dist=10, padding_mode="replicate", attn_impl="pallas")
model = HeptTransformer(cfg)
x, c, v = (jnp.asarray(b[k][0]) for k in ("x","coords","valid"))
pairs, pm = jnp.asarray(b["pairs"][0]), jnp.asarray(b["pair_mask"][0])
cid, rec, pts = (jnp.asarray(b[k][0]) for k in ("cluster_ids","recons","pts"))
variables = model.init(jax.random.PRNGKey(0), x, c, v)

fwd = jax.jit(lambda vr: model.apply(vr, x, c, v))
out = fwd(variables); jax.block_until_ready(out)
print("fwd out finite:", bool(jnp.isfinite(out).all()), "shape", out.shape, flush=True)
t0=time.perf_counter()
for _ in range(5): out = fwd(variables)
jax.block_until_ready(out); print("fwd ms:", (time.perf_counter()-t0)/5*1e3, flush=True)

loss0 = infonce_loss(out, pairs, pm, cid, rec, pts)
print("loss0:", float(loss0), flush=True)

tx = optax.adam(1e-2)
opt_state = tx.init(variables["params"])
@jax.jit
def step(params, opt_state):
    def loss_of(p):
        o = model.apply({"params": p, "constants": variables["constants"]}, x, c, v)
        return infonce_loss(o, pairs, pm, cid, rec, pts)
    loss, grads = jax.value_and_grad(loss_of)(params)
    gn = optax.global_norm(grads)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss, gn
params = variables["params"]
for i in range(6):
    params, opt_state, loss, gn = step(params, opt_state)
    print(i, "loss", float(loss), "gnorm", float(gn), flush=True)
t0=time.perf_counter()
for _ in range(5): params, opt_state, loss, gn = step(params, opt_state)
jax.block_until_ready(loss); print("step ms:", (time.perf_counter()-t0)/5*1e3, flush=True)
