"""Residue probe: fwd+bwd at n_layers in {0, 1, 4} isolates the
encoder+head+AD base cost from the per-layer cost (VERDICT r2 #4)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig

N = 60_000
rng = np.random.default_rng(0)
ev = synthetic_tracking_event(rng, n_points=N)
batch = pack_events([ev], block_size=100)
x = jnp.asarray(batch["x"][0])
coords = jnp.asarray(batch["coords"][0])
valid = jnp.asarray(batch["valid"][0])


def fence(v):
    return float(jnp.asarray(v, jnp.float32).ravel()[0])


def timeit(tag, f, *args, iters=10):
    out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    fence(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<44s} {dt:8.2f} ms", flush=True)
    return dt


results = {}
for nl in (1, 4):
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        h_dim=24, num_heads=8, n_layers=nl, block_size=100, n_hashes=3,
        num_regions=150, num_w_per_dist=10, padding_mode="replicate",
        attn_impl="hybrid", scan_layers=True, sort_pack=True, sort_ops=8,
        qkv_post_sort=True, unsort_pack=True, share_heads=True,
        kernel_bf16=True,
    )
    model = HeptTransformer(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, coords, valid)
    jax.block_until_ready(variables)

    @jax.jit
    def fb(p, c):
        def f(p):
            o = model.apply({"params": p, "constants": c}, x, coords, valid)
            return (o * o).sum()
        return jax.value_and_grad(f)(p)

    results[nl] = timeit(f"model fwd+bwd n_layers={nl}", fb,
                         variables["params"], variables["constants"])

per_layer = (results[4] - results[1]) / 3
base = results[1] - per_layer
print(f"\nper-layer fwd+bwd = {per_layer:.1f} ms; encoder+head+AD base = "
      f"{base:.1f} ms", flush=True)
