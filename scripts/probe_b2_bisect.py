"""Bisect the B=2 stacked-forward superlinearity by component knockout.

probe_b2_stacked: fwd B=1 34.4 ms (320 GB/s achieved) vs B=2 102.7 ms
(238 GB/s) — +49%/point at +11%/point compiled bytes, while every isolated
primitive is sub-linear per point (probe_b2_prims). This times the REAL
model forward at B in {1, 2} under component knockouts, so the wall is
attributable even if the xplane profiler can't capture device planes
through the axon tunnel (probe_xprof is the finer-grained tool).

Arms (all nh2r8cv2r base, flat batched, sort_events=B):
  full        — the bench configuration
  xla         — attn_impl=xla (no Pallas kernels; kernel vs transport)
  nounsortrows— unsort_rows=False (sort-based unsort)
  nopack      — sort_pack=False (f32 transport; u32-pack interaction)
  l1          — n_layers=1 (attention stack vs encoder/prepare: the l1
                ratio isolates the per-layer scaling from the fixed
                encoder/prepare cost by differencing against full)

Run on TPU: python scripts/probe_b2_bisect.py [iters]

Each arm runs in an isolated subprocess (--arm <name> recursion): Mosaic
remote-compile failures SIGABRT the whole process (runs/r4/probe_b2_bisect.log),
so in-process try/except cannot keep the sweep alive — subprocess isolation can.
Select arms with B2_ARMS=a,b (unknown names are an error up front).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

ARM_NAMES = ["full", "xla", "nounsortrows", "nopack", "l1", "slab128",
             "pallasfwd"]  # crash-prone Mosaic arms last

if "--arm" not in sys.argv:
    # Parent: one subprocess per arm so a crashing arm can't kill the sweep.
    only = os.environ.get("B2_ARMS", "")
    names = [n.strip() for n in only.split(",") if n.strip()] or ARM_NAMES
    unknown = [n for n in names if n not in ARM_NAMES]
    if unknown:
        sys.exit(f"unknown B2_ARMS entries {unknown}; known: {ARM_NAMES}")
    extra = [a for a in sys.argv[1:]]
    for n in names:
        rc = subprocess.call([sys.executable, __file__, *extra, "--arm", n])
        if rc != 0:
            print(f"  [{n}] FAILED rc={rc} (continuing to next arm)",
                  flush=True)
    sys.exit(0)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from train_60k_demo import VARIANTS

from hept_tpu.data.batching import pack_events
from hept_tpu.data.synthetic import synthetic_tracking_event
from hept_tpu.models import (HeptTransformer, TransformerConfig,
                             make_flat_batched_apply)

_args = [a for a in sys.argv[1:] if a != "--arm" and a not in ARM_NAMES]
ARM = sys.argv[sys.argv.index("--arm") + 1]
ITERS = int(_args[0]) if _args else 10

rng = np.random.default_rng(0)
events = [synthetic_tracking_event(rng, n_points=60_000, avg_track_size=8,
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

ARMS = {
    "full": {},
    "xla": {"attn_impl": "xla"},
    "nounsortrows": {"unsort_rows": False},
    "nopack": {"sort_pack": False, "unsort_pack": False},
    "l1": {"n_layers": 1},
    # HLO-diff hypothesis (runs/r4/hlo_b{1,2}.txt): at B=2 XLA stops fusing
    # the f32->bf16 convert into the (G,B,B) logits producer — the hybrid
    # XLA forward materializes 2x768 MB f32 (vs 2x192 MB bf16 at B=1),
    # +2.4 GB/step. The Pallas loop forward never materializes p in HBM,
    # so it should scale linearly where hybrid doesn't.
    # bs=128: the loop2 kernel cannot compile bs=100 (dynamic sublane index
    # with a partial 100-lane vector.load, bucket_attn_pallas.py:540)
    "pallasfwd": {"attn_impl": "loop2", "block_size": 128},
    # same hypothesis on the bs128 slab grid (the acc arm's kernel)
    "slab128": {"attn_impl": "slab2", "block_size": 128},
}

batches = {}


def get_batch(B, bs):
    if (B, bs) not in batches:
        bt = pack_events(events[:B], block_size=bs, window_pairs=128)
        batches[(B, bs)] = tuple(
            jnp.asarray(bt[k]) for k in ("x", "coords", "valid"))
    return batches[(B, bs)]


def time_arm(name, overrides):
    res = {}
    for B in (1, 2):
        cfg = TransformerConfig(**{**base, **overrides, "sort_events": B})
        model = HeptTransformer(cfg)
        flat = make_flat_batched_apply(model)
        x, coords, valid = get_batch(B, cfg.block_size)
        # init on a sort_events=1 twin: param shapes are layout-independent,
        # and a single-event apply under sort_events=B would split the event
        # into B rows (ne = n/B, not a block multiple -> trace error).
        init_model = HeptTransformer(
            TransformerConfig(**{**base, **overrides, "sort_events": 1}))
        variables = jax.jit(init_model.init)(
            jax.random.PRNGKey(0), x[0], coords[0], valid[0])
        jax.block_until_ready(variables)
        fwd = jax.jit(lambda v, x, c, vl: flat(v, x, c, vl).sum())
        t0 = time.perf_counter()
        float(fwd(variables, x, coords, valid))
        compile_s = time.perf_counter() - t0
        for _ in range(2):
            float(fwd(variables, x, coords, valid))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fwd(variables, x, coords, valid)
        float(r)
        res[B] = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"  [{name}] B={B}: {res[B]:8.2f} ms (compile {compile_s:.0f}s)",
              flush=True)
    print(f"  [{name}] per-point ratio B2/(2*B1) = {res[2]/(2*res[1]):.3f}",
          flush=True)
    return res


print(f"backend={jax.default_backend()} iters={ITERS} arm={ARM}", flush=True)
time_arm(ARM, ARMS[ARM])
