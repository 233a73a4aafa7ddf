import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig

rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=60000, avg_track_size=8, pairs_per_point=8)
b = pack_events([ev], block_size=100)
x = jnp.asarray(b["x"][0])
c = jnp.asarray(b["coords"][0])
v = jnp.asarray(b["valid"][0])


def bench(tag, **kw):
    cfg = TransformerConfig(
        in_dim=x.shape[1], coords_dim=c.shape[1], task="tracking",
        h_dim=24, num_heads=8, block_size=100, n_hashes=3, num_regions=150,
        num_w_per_dist=10, **kw,
    )
    model = HeptTransformer(cfg)
    variables = model.init(jax.random.PRNGKey(0), x, c, v)
    f = jax.jit(lambda vr: model.apply(vr, x, c, v))
    out = f(variables)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(variables)
    jax.block_until_ready(out)
    print(tag, (time.perf_counter() - t0) / 5 * 1e3, "ms", flush=True)


bench("L0 replicate", n_layers=0, padding_mode="replicate", attn_impl="pallas")
bench("L1 replicate pallas", n_layers=1, padding_mode="replicate", attn_impl="pallas")
bench("L1 replicate xla", n_layers=1, padding_mode="replicate", attn_impl="xla")
bench("L1 zero pallas", n_layers=1, padding_mode="zero", attn_impl="pallas")
bench("L4 replicate pallas", n_layers=4, padding_mode="replicate", attn_impl="pallas")
