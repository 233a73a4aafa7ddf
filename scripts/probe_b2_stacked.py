"""Probe: where does the stacked (sort_events) B=2 forward lose linearity?

probe_b2_superlinear measured full step B=2 = 246.9 ms vs 2x the 95.6 ms
B=1 headline (1.29x/event), with the loss exactly linear (33.6 vs 2x16.4)
and the forward at 150.4 ms vs an expected ~2x32.4 — the gap is ENTIRELY
in the stacked forward path (VERDICT r3 next #5).

This probe isolates it: for B in {1, 2} (both through make_flat_batched_
apply + sort_events=B so the wrapper itself is controlled for), times
  fwd        full stacked forward
  prep       vmapped _prepare_event only (region quantiles + codes)
  plan+attn  forward minus the head (encoder + plan + 4 attention layers)
and prints XLA cost analysis (flops / bytes) for each, whose B-scaling
separates structural superlinearity (visible in bytes) from runtime
effects (grid overheads, fusion differences).

Run: python scripts/probe_b2_stacked.py [iters=15]
(CPU also works for the cost-analysis part; timings need the TPU.)
"""
import sys
import time

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
from hept_tpu.models.transformer import _prepare_event

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 15
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


def timeit(tag, fn, *args, iters=ITERS):
    r = fn(*args)
    jax.block_until_ready(r)
    fence = lambda x: float(jnp.asarray(  # noqa: E731
        jax.tree_util.tree_leaves(x)[0]).reshape(-1)[0])
    fence(r)
    for _ in range(2):
        r = fn(*args)
    fence(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:<16s} {dt:8.2f} ms", flush=True)
    return dt


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
    prep = jax.jit(
        lambda v, x, c, vl: jax.tree_util.tree_leaves(
            jax.vmap(lambda xe, ce, ve: _prepare_event(
                xe, ce, ve, v["constants"]["regions"], cfg))(x, c, vl)
        )[0].sum()
    )

    print(f"== B={B} (sort_events={B}) ==", flush=True)
    for tag, fn in (("fwd", fwd), ("prep", prep)):
        try:
            comp = fn.lower(variables, x, coords, valid).compile()
            ca = comp.cost_analysis() or {}
            print(f"  {tag}: flops={ca.get('flops', 0)/1e9:.2f}G "
                  f"bytes={ca.get('bytes accessed', 0)/1e9:.3f}GB", flush=True)
        except Exception as e:
            print(f"  {tag}: cost analysis failed ({type(e).__name__})")
        timeit(f"  {tag}", fn, variables, x, coords, valid)
