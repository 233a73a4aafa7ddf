"""Per-op device profile via jax.profiler + offline xplane parsing.

Modes:
  python scripts/probe_xprof.py b2fwd            # stacked fwd at B=1 and B=2
  python scripts/probe_xprof.py step <variant>   # full train step of an arm

Why: the stacked B=2 forward runs 1.49x per point vs B=1 (102.7 vs 2x34.4
ms, runs/r4/probe_b2_stacked.log) while every isolated primitive is
sub-linear per point (probe_b2_prims) and compiled bytes are ~linear
(dump_b2_hlo: 24.44 vs 2x11.0 GB). Static HLO diffing (hlo_b{1,2}.txt)
shows a near-identical op mix — the regression is in per-op RUNTIME, which
only a device trace can attribute. tensorboard_plugin_profile is baked in,
so we parse the raw .xplane.pb with tensorflow.tsl's proto and aggregate
XLA-op durations per plane/line offline (no TensorBoard UI needed).

Output: for each case, every device plane line's total time over ITERS
timed iterations and its top ops by cumulative duration (ms PER ITERATION),
plus HLO-category rollups (fusion / sort / custom-call / copy / ...).
"""
import glob
import os
import re
import sys
import time
import collections

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

ITERS = 10


def parse_xplane(logdir, iters):
    """Aggregate event durations from the newest .xplane.pb under logdir."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print(f"  !! no .xplane.pb under {logdir}", flush=True)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    names = [p.name for p in space.planes]
    if not any(re.search(r"TPU|GPU|/device|Custom", n, re.I) for n in names):
        print(f"  !! no device plane; planes present: {names}", flush=True)
    for plane in space.planes:
        # keep device planes; the host python/TF planes are noise here
        if not re.search(r"TPU|GPU|/device|Custom", plane.name, re.I):
            continue
        meta = {m.id: (m.display_name or m.name)
                for m in plane.event_metadata.values()}
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            total = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
                total += ev.duration_ps
            if total == 0:
                continue
            print(f"  plane '{plane.name}' line '{line.name}': "
                  f"total {total/1e9/iters:.3f} ms/iter "
                  f"({len(line.events)} events)", flush=True)
            if len(tot) <= 2 and len(line.events) <= iters * 2 + 4:
                continue  # module-level line; per-op lines are below
            cat = collections.Counter()
            for name, ps in tot.items():
                m = re.match(r"%?([a-zA-Z][\w\-]*?)[\.\d]*$",
                             name.split(" ")[0])
                cat[m.group(1) if m else name] += ps
            print("    -- categories --", flush=True)
            for name, ps in cat.most_common(14):
                print(f"    {ps/1e9/iters:9.3f} ms  {name}", flush=True)
            print("    -- top ops --", flush=True)
            for name, ps in tot.most_common(22):
                print(f"    {ps/1e9/iters:9.3f} ms  x{cnt[name]:<5d}"
                      f" {name[:90]}", flush=True)


def trace_run(tag, fn):
    """Warm up, then trace ITERS timed runs of fn (fn must block)."""
    fn()  # compile
    fn()
    logdir = f"/tmp/xprof/{tag}"
    os.makedirs(logdir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(ITERS):
            fn()
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"== {tag}: wall {dt:.2f} ms/iter over {ITERS} traced iters",
          flush=True)
    parse_xplane(logdir, ITERS)


def run_b2fwd():
    from train_60k_demo import VARIANTS
    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import (HeptTransformer, TransformerConfig,
                                 make_flat_batched_apply)

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
                   kernel_bf16=True, padding_mode="replicate",
                   attn_impl=impl),
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
            jax.random.PRNGKey(0), x[0], coords[0], valid[0])
        jax.block_until_ready(variables)
        fwd = jax.jit(lambda v, x, c, vl: flat(v, x, c, vl).sum())

        def once():
            float(fwd(variables, x, coords, valid))  # host-read fence

        trace_run(f"b{B}fwd", once)


def run_step(variant):
    import optax
    from train_60k_demo import VARIANTS
    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.losses import infonce_loss
    from hept_tpu.train.optim import make_optimizer
    from hept_tpu.train.state import TrainState

    rng = np.random.default_rng(0)
    ev = synthetic_tracking_event(rng, n_points=60_000, avg_track_size=8,
                                  pairs_per_point=16)
    vk = dict(VARIANTS[variant])
    attn_impl = vk.pop("_attn_impl", "hybrid")
    vk.pop("_clip", None)
    vk.pop("_lr", None)
    bs = vk.get("block_size", 100)
    batch = pack_events([ev], block_size=bs, window_pairs=128)
    keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids",
            "recons", "pts", "pair_rev", "pair_weight", "pair_neg")
    bt = {k: jnp.asarray(batch[k][0]) for k in keys}
    cfg = TransformerConfig(
        in_dim=ev.x.shape[1], coords_dim=ev.coords.shape[1], task="tracking",
        **{
            **dict(block_size=100, n_hashes=3, num_regions=150, num_heads=8,
                   h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
                   sort_ops=8, qkv_post_sort=True, scan_layers=True,
                   unsort_pack=True, shared_sort=True, share_heads=True,
                   kernel_bf16=True, padding_mode="replicate",
                   attn_impl=attn_impl),
            **vk,
        },
    )
    model = HeptTransformer(cfg)
    tx = make_optimizer("adam", lr=1e-2)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"])
    jax.block_until_ready(variables)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    @jax.jit
    def step(state, bt):
        def loss_of(p):
            out = model.apply({"params": p, "constants": state.constants},
                              bt["x"], bt["coords"], bt["valid"])
            return infonce_loss(
                out, bt["pairs"], bt["pair_mask"], bt["cluster_ids"],
                bt["recons"], bt["pts"], windowed_pairs=True,
                pair_rev=bt["pair_rev"], pair_weight=bt["pair_weight"],
                pair_neg=bt["pair_neg"])

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    box = [state]

    def once():
        box[0], loss = step(box[0], bt)
        float(loss)

    trace_run(f"step_{variant}", once)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "b2fwd"
    print(f"backend={jax.default_backend()} mode={mode}", flush=True)
    if mode == "b2fwd":
        run_b2fwd()
    else:
        run_step(sys.argv[2] if len(sys.argv) > 2 else "nh2r8cv2r")
