"""Dump the TPU-compiled HLO of the stacked forward at B in {1, 2}.

The B=2 stacked fwd reads 24.44 GB vs 2x10.997 expected (TPU compiled cost
analysis) while the CPU-compiled analysis is exactly 2x — the extra ~2.4 GB
is a TPU fusion/materialization artifact. This dumps `compiled.as_text()`
for both batch sizes to runs/r4/hlo_b{1,2}.txt so the big buffers can be
diffed offline (grep for fusion/copy ops with (.*, 120000)-minor shapes
that have no B=1 counterpart).

Run on TPU: python scripts/dump_b2_hlo.py
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import HeptTransformer, TransformerConfig, make_flat_batched_apply

N = 60_000
rng = np.random.default_rng(0)
events = [synthetic_tracking_event(rng, n_points=N, avg_track_size=8,
                                   pairs_per_point=16) for _ in range(2)]

vk = dict(VARIANTS["nh2r8cv2r"])
impl = vk.pop("_attn_impl", "hybrid")
base = dict(
    in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
    task="tracking",
    **{
        **dict(block_size=100, n_hashes=3, num_regions=150, num_heads=8,
               h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
               sort_ops=8, qkv_post_sort=True, scan_layers=True,
               unsort_pack=True, shared_sort=True, share_heads=True,
               kernel_bf16=True, padding_mode="replicate", attn_impl=impl),
        **vk,
    },
)

for B in (1, 2):
    cfg = TransformerConfig(**{**base, "sort_events": B})
    model = HeptTransformer(cfg)
    flat = make_flat_batched_apply(model)
    bt = pack_events(events[:B], block_size=100, window_pairs=128)
    x = jnp.asarray(bt["x"])
    coords = jnp.asarray(bt["coords"])
    valid = jnp.asarray(bt["valid"])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), x[0], coords[0], valid[0]
    )
    jax.block_until_ready(variables)
    fwd = jax.jit(lambda v, x, c, vl: flat(v, x, c, vl).sum())
    comp = fwd.lower(variables, x, coords, valid).compile()
    txt = comp.as_text()
    path = f"runs/r4/hlo_b{B}.txt"
    with open(path, "w") as f:
        f.write(txt)
    ca = comp.cost_analysis() or {}
    print(f"B={B}: bytes={ca.get('bytes accessed', 0)/1e9:.3f}GB "
          f"flops={ca.get('flops', 0)/1e9:.2f}G -> {path} "
          f"({len(txt)} chars)", flush=True)
