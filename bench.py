"""Benchmark: tracking-60k training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec/chip", "vs_baseline": N, ...}

Baseline: the reference repo records no numbers (BASELINE.md). We benchmark
the same workload the reference's example notebook times (>60k-point events,
reference hyperparameters 8 heads / 4 layers / h_dim 24) but as a full
*training* step (fwd + bwd + adam). `vs_baseline` is computed against
A100_TRAIN_POINTS_PER_SEC below — an estimate for the PyTorch reference on
A100 documented in BASELINE.md; replace with a measured value when GPU
hardware is available.

The bench reports TWO arms (the north star is throughput AT parity recall,
so the headline is the accuracy-first arm):
  headline  hept_acc (nh2r8bs512cv2r since round 5): the nh2 8-round
            stack at 512-point buckets — big buckets buy co-bucket recall
            at fixed transport cost and the flat-slab kernels price any
            bucket size the same (~(1024, 1024) masked slab). 60k acc@0.9
            **0.9513 ± 0.005 3-seed @ 25 ep at 102.0 ms** (588k pts/s) —
            above the 0.9499 ± 0.008 parity-accuracy bar at ~5.9× its
            speed, and better than the round-4 r12bs128cv2r acc arm
            (0.9418 ± 0.008 @ 138.8 ms) on BOTH axes (BASELINE.md round-5
            section; runs/r5 logs). Reported as metric/value/vs_baseline,
            best over event-batch sizes {1, 2} (stacked flat batching for
            B > 1).
  fast      nh2r8cv2r (the round-3 headline, 0.9341 @ 95.6 ms) — reported
            as step_ms_fast / pts_per_s_fast so the speed point stays
            visible round over round.
Also reported: single-event step/fwd latency, the 6k flat-batch line, the
strict reference-parity-mode step, MFU (vs the v5e 197 TFLOP/s bf16 peak)
and achieved HBM bandwidth from XLA's compiled cost analysis.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

# Estimated PyTorch-reference A100 training throughput for tracking-60k
# (batch_size=1, fp32/tf32). See BASELINE.md "Throughput baseline assumption".
A100_TRAIN_POINTS_PER_SEC = 1.0e6
V5E_PEAK_FLOPS = 197e12  # bf16; f32 runs lower — MFU is vs this peak

N_POINTS = 60_000
WARMUP = 3
ITERS = 15
BATCH_SIZES = (1, 2)
PARITY_BUDGET_S = 2400  # cold-cache parity compile bound (cached afterwards)
# Last committed warm parity measurement (runs/r4/time_parity.log: 598.0 ms,
# compile 131.6 s on a warm persistent cache). Reported with
# "step_ms_parity_stale": true ONLY if live attempts fail — VERDICT r4 #5:
# the driver artifact must never carry a null parity field again.
LAST_KNOWN_PARITY_MS = 598.0
# secondary line: tracking-6k with stacked flat batching (the reference's
# other primary scale; small events are where flat batching is the >5x
# lever — BASELINE.md scaling notes)
N_POINTS_6K = 6_000
BATCH_6K = 8


def main():
    import jax

    try:  # persistent compile cache cuts tunnel-compile latency across runs
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import optax

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import (
        HeptTransformer,
        TransformerConfig,
        make_flat_batched_apply,
    )
    from hept_tpu.train.losses import infonce_loss
    from hept_tpu.train.optim import make_optimizer
    from hept_tpu.train.state import TrainState

    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    events = [
        synthetic_tracking_event(
            rng, n_points=N_POINTS, avg_track_size=8, pairs_per_point=16
        )
        for _ in range(max(BATCH_SIZES))
    ]
    events6k = [
        synthetic_tracking_event(
            rng, n_points=N_POINTS_6K, avg_track_size=8, pairs_per_point=16
        )
        for _ in range(BATCH_6K)
    ]

    def _stamp(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    def make_cfg(**overrides):
        base = dict(
            in_dim=events[0].x.shape[1],
            coords_dim=events[0].coords.shape[1],
            task="tracking",
            h_dim=24, num_heads=8, n_layers=4, block_size=100,
            n_hashes=2,  # OR width 2 per layer, 8-round cross-layer union
            # (static_rounds below): faster than 3-round OR3 AND more
            # accurate at 60k (nh2r8v2 arm: acc@0.9 0.9353 vs fullrv2
            # 0.9288; union co-bucket recall 0.976). Parity mode restores
            # the reference's n_hashes=3.
            num_regions=150, num_w_per_dist=10,
            padding_mode="replicate",
            attn_impl="hybrid2" if on_tpu else "xla",  # einsum fwd + pallas
            # bf16 v2 bwd (f32-grade numerics at bf16-MXU cost; 169.6 ->
            # 144.0 ms with rows. 60k-validated: fullrv2 acc@0.9 0.9288 vs
            # full 0.9305 — the OLD bf16 bwd collapsed at 60k, see ROADMAP)
            scan_layers=True,
            sort_pack=True,  # bf16-packed sort payloads (validated: converges
            # identically to f32 on this workload; BASELINE.md round-1 notes)
            sort_ops=8,  # 8 payload operands per sort call (less key traffic)
            qkv_post_sort=True,  # sort [x|coords], project after the sort
            unsort_pack=True,  # bf16 OR-accumuland unsort (convergence-
            # validated: acc@0.9 0.9427 vs 0.9433 f32 on synthetic tracking)
            shared_sort=True,  # bucket q by the key hash order: one sorted
            # [x|coords] serves q/k/v, halving the dominant sort call
            # (convergence-validated: acc@0.9 0.9424 vs 0.9432 separate,
            # scripts/validate_shared_sort.py)
            share_heads=True,  # ONE bucket grid per OR round shared by all
            # heads: n_hashes sort rows instead of n_hashes*num_heads, one
            # sorted [x|coords] copy instead of num_heads (step 305.8 ->
            # 240.4 ms; convergence-validated: acc@0.9 0.9433 vs 0.9446
            # shared_sort, scripts/validate_share_heads.py)
            kernel_bf16=True,  # bf16 bucket-kernel operands, f32 accum
            # (step 240.4 -> 200.8 ms; convergence-validated: acc@0.9
            # 0.9424 vs 0.9431 f32, scripts/validate_kernel_bf16.py)
            static_keys="x0",  # layer-invariant bucket hashes: hash the
            # encoder output once per step, reuse the permutations across
            # all layers; per-layer x-reorders become packed gathers
            # (step 200.0 -> 187.2 ms; convergence-validated: acc@0.9
            # 0.9427 vs 0.9434 base, scripts/validate_static_keys.py)
            static_rounds=8,  # 8-round static plan, layers cycle 2-round
            # subsets: the cross-layer round union carries the co-bucket
            # coverage that per-layer OR width used to (BASELINE.md round-3
            # matrix; 60k-validated with n_hashes=2: nh2r8v2 0.9353 @
            # 123.6 ms vs the 3-round OR3 stack's 0.9288 @ 144.0)
            kernel_center=True,  # per-bucket RPE centering: exact in f32
            # (RBF logits are shift-invariant), removes the bf16 rounding
            # floor at trained sqrt_w scales; ~zero step cost and
            # 60k-validated on this exact stack (nh2r8cv2: acc@0.9 0.9341
            # @ 124.5 ms vs nh2r8v2 0.9334 @ 123.6)
            unsort_rows=True,  # row-gather unsort per static round: EXACT
            # layout change (tests/test_unsort_rows.py non-canon case), so
            # nh2r8cv2's convergence evidence carries; step 124.5 -> 95.6 ms
            # (queue18 timer nh2r8cv2r: 627.9k pts/s)
        )
        base.update(overrides)
        return TransformerConfig(**base)

    parity_only = "--parity-only" in sys.argv

    # hept_acc (nh2r8bs512cv2r since round 5): the accuracy-first headline
    # arm — the nh2 8-round stack at 512-point buckets. Big buckets buy
    # co-bucket recall at FIXED transport cost (union 0.9960 vs the
    # round-4 r12bs128 arm's 0.9902) and the flat-slab kernels compute the
    # same ~(1024, 1024) masked MXU slab regardless of bucket size, so the
    # step is 102.0 ms vs the old acc arm's 138.8 (60k acc@0.9
    # 0.9513 ± 0.005 3-seed @ 25 ep vs 0.9418 ± 0.008 — better on BOTH
    # axes; runs/r5, BASELINE.md round 5). block_size 512 is a documented
    # divergence (PARITY.md): more neighbors per point than the
    # reference's 100.
    ACC_OVERRIDES = dict(
        block_size=512,
        attn_impl="slab2" if on_tpu else "xla",
    )
    ACC_BLOCK = 512

    cfg = make_cfg(**ACC_OVERRIDES)  # headline (accuracy arm)
    model = HeptTransformer(cfg)
    fast_model = HeptTransformer(make_cfg())  # nh2r8cv2r speed arm
    tx = make_optimizer("adam", lr=1e-2)

    def pack(b, evs=None, block=ACC_BLOCK):
        # 128-window pair layout: the loss uses the windowed MXU pair ops
        batch = pack_events((evs or events)[:b], block_size=block,
                            window_pairs=128)
        keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids",
                "recons", "pts", "pair_rev", "pair_weight", "pair_neg")
        return {k: jnp.asarray(batch[k]) for k in keys}

    # IMPORTANT: batches travel as jitted-function ARGUMENTS, never closure
    # constants (closure-captured device arrays are embedded into the lowered
    # module: minutes of lowering on a remote backend).
    def make_step(b, mdl=None, overrides=ACC_OVERRIDES):
        import jax

        mdl = mdl or model
        if b > 1:
            # stacked flat batching: each event rides the bucket sorts as its
            # own batch row — linear in B (ops/bucket_attn.py sort_events),
            # unlike the round-2 concatenated-row flat batch whose sort
            # comparator grew n log n (B=2 was 1.2x/event).
            mdl = HeptTransformer(make_cfg(sort_events=b, **overrides))
            flat_apply = make_flat_batched_apply(mdl)

        @jax.jit
        def train_step(state, bt):
            def loss_of(p):
                if b == 1:
                    out = mdl.apply(
                        {"params": p, "constants": state.constants},
                        bt["x"][0], bt["coords"][0], bt["valid"][0],
                    )[None]
                else:
                    out = flat_apply(
                        {"params": p, "constants": state.constants},
                        bt["x"], bt["coords"], bt["valid"],
                    )
                import jax.numpy as jnp

                # unrolled per-event losses (vmap of the Pallas windowed
                # pair ops would add a batched grid dim; B is tiny here)
                losses = [
                    infonce_loss(
                        out[i], bt["pairs"][i], bt["pair_mask"][i],
                        bt["cluster_ids"][i], bt["recons"][i], bt["pts"][i],
                        windowed_pairs=True,
                        pair_rev=bt["pair_rev"][i],
                        pair_weight=bt["pair_weight"][i],
                        pair_neg=bt["pair_neg"][i],
                    )
                    for i in range(b)
                ]
                return sum(losses) / len(losses)

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=params, opt_state=opt_state
            ), loss

        return train_step

    bt1 = pack(1)  # accuracy-arm layout (block 128)
    bt1f = pack(1, block=100)  # fast-arm + parity layout (reference block)

    if parity_only:
        # Reference-parity-mode step (no fast-mode divergences: per-head
        # hashing, independent q/k bucket sorts, f32 sort/unsort transport,
        # f32 kernels, per-layer keys). Run as a child process (see below)
        # because its f32 unpacked variadic sorts compile for a long time on
        # a cold cache; the parent bounds it with a timeout so the headline
        # JSON always lands.
        pmodel = HeptTransformer(make_cfg(
            sort_pack=False, sort_ops=1, unsort_pack=False, shared_sort=False,
            share_heads=False, kernel_bf16=False, kernel_center=False,
            static_keys=False, canon_residual=False,
            # NOTE round-4 negative result: the exact transport levers
            # (unsort_rows dynamic + gather_sort) REGRESS parity on
            # hardware — 945.8 ms vs 599 (runs/r4/bench_r4.log) — because
            # the per-head parity payloads are NARROW (100-120 B/row f32)
            # and TPU row gathers run ~8 GB/s at those widths (the round-1
            # finding that made payload-through-sort the design). Both
            # levers stay implemented + tested (exact; they win at the
            # >=400 B row widths of the fast arms' unsort); the parity
            # mode keeps the variadic-sort transport. Attribution timers:
            # runs/r4/time_parity*.log (queue28).
            unsort_rows=False, gather_sort=False,
            attn_impl="hybrid",
            n_hashes=3, static_rounds=0,  # reference OR width, per-layer keys
        ))
        _stamp("parity-mode compile")
        pvars = jax.jit(pmodel.init)(
            jax.random.PRNGKey(0), bt1f["x"][0], bt1f["coords"][0],
            bt1f["valid"][0]
        )
        jax.block_until_ready(pvars)
        pstate = TrainState.create(pvars, tx, jax.random.PRNGKey(1))
        pstep = make_step(1, mdl=pmodel)
        ps, pl = pstep(pstate, bt1f)
        float(pl)
        for _ in range(WARMUP - 1):
            ps, pl = pstep(ps, bt1f)
        float(pl)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            ps, pl = pstep(ps, bt1f)
        float(pl)
        parity_ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"PARITY_MS {parity_ms:.2f}", flush=True)
        return

    _stamp("init model")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), bt1["x"][0], bt1["coords"][0], bt1["valid"][0]
    )
    jax.block_until_ready(variables)
    state0 = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    results = {}
    cost = {}

    def run_batch(b):
        bt = pack(b)
        step = make_step(b)
        state = state0
        _stamp(f"compile B={b}")
        try:
            compiled = step.lower(state, bt).compile()
            ca = compiled.cost_analysis() or {}
            cost[b] = {
                "flops": float(ca.get("flops", 0.0)),
                "bytes": float(ca.get("bytes accessed", 0.0)),
            }
        except Exception:
            cost[b] = {"flops": 0.0, "bytes": 0.0}
        state, loss = step(state, bt)
        float(loss)  # host-read fence (block_until_ready can return early
        # through the remote tunnel)
        for _ in range(WARMUP - 1):
            state, loss = step(state, bt)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, loss = step(state, bt)
        final = float(loss)
        dt = (time.perf_counter() - t0) / ITERS
        results[b] = (dt, final)
        _stamp(f"B={b}: {dt*1e3:.1f} ms/step, {b*N_POINTS/dt:,.0f} pts/s")

    for b in BATCH_SIZES:
        if b == 1:
            run_batch(b)
        else:
            try:  # larger flat batches can exhaust HBM / the AOT compiler
                run_batch(b)
            except Exception as e:
                _stamp(f"B={b} failed ({type(e).__name__}); skipping")

    best_b = max(results, key=lambda b: b * N_POINTS / results[b][0])
    dt_best, loss_best = results[best_b]
    pps = best_b * N_POINTS / dt_best
    dt1 = results[1][0]

    # fast arm (nh2r8cv2r, the round-3 headline): kept visible round over
    # round as step_ms_fast / pts_per_s_fast (60k acc@0.9 0.9341).
    fast_ms = None
    fvars = jax.jit(fast_model.init)(
        jax.random.PRNGKey(0), bt1f["x"][0], bt1f["coords"][0],
        bt1f["valid"][0]
    )
    jax.block_until_ready(fvars)
    fstate0 = TrainState.create(fvars, tx, jax.random.PRNGKey(1))
    try:
        _stamp("fast arm B=1")
        fstate = fstate0
        fstep = make_step(1, mdl=fast_model)
        fstate, fl = fstep(fstate, bt1f)
        float(fl)
        for _ in range(WARMUP - 1):
            fstate, fl = fstep(fstate, bt1f)
        float(fl)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            fstate, fl = fstep(fstate, bt1f)
        float(fl)
        fast_ms = (time.perf_counter() - t0) / ITERS * 1e3
        _stamp(f"fast arm: {fast_ms:.1f} ms/step, {N_POINTS/fast_ms*1e3:,.0f} pts/s")
    except Exception as e:
        _stamp(f"fast arm failed ({type(e).__name__}); omitting")

    # forward-only latency, single event (reference example.ipynb cells 9-10)
    fwd = jax.jit(
        lambda p, c, bt: model.apply(
            {"params": p, "constants": c}, bt["x"][0], bt["coords"][0],
            bt["valid"][0],
        )
    )
    out = fwd(state0.params, state0.constants, bt1)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(state0.params, state0.constants, bt1)
    float(out.sum())
    fwd_ms = (time.perf_counter() - t0) / ITERS * 1e3

    # tracking-6k flat batch (reference's other primary scale): B events ride
    # the bucket sorts as separate batch rows (sort_events) — at small n the
    # per-sort-call latency floors dominate a single event, so flat batching
    # is the big lever here (unlike 60k where B=1 wins).
    step6k_ms = pps6k = None
    try:
        _stamp(f"6k flat batch B={BATCH_6K}")
        bt6 = pack(BATCH_6K, events6k, block=100)
        step6 = make_step(BATCH_6K, overrides={})
        st6, l6 = step6(fstate0, bt6)
        float(l6)
        for _ in range(WARMUP - 1):
            st6, l6 = step6(st6, bt6)
        float(l6)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            st6, l6 = step6(st6, bt6)
        float(l6)
        dt6 = (time.perf_counter() - t0) / ITERS
        step6k_ms = dt6 * 1e3
        pps6k = BATCH_6K * N_POINTS_6K / dt6
        _stamp(f"6k B={BATCH_6K}: {step6k_ms:.1f} ms/step, {pps6k:,.0f} pts/s")
    except Exception as e:
        _stamp(f"6k flat batch failed ({type(e).__name__}); omitting")

    # Reference-parity-mode step (no fast-mode divergences: per-head hashing,
    # independent q/k bucket sorts, f32 sort/unsort transport), reported
    # alongside the fast number so round-over-round progress can't silently
    # ride the validated divergences (VERDICT r2 #9). Runs in a child process
    # with a hard timeout: its cold-cache compile can exceed the whole bench
    # budget, and the headline JSON must always land.
    parity_ms = None
    parity_stale = False
    # Two attempts: if the first dies mid-compile (cold cache through the
    # remote tunnel), the second rides whatever the persistent cache captured.
    for attempt in (1, 2):
        try:
            _stamp(f"parity mode (subprocess, attempt {attempt})")
            proc = subprocess.run(
                [sys.executable, __file__, "--parity-only"],
                capture_output=True, text=True, timeout=PARITY_BUDGET_S,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("PARITY_MS "):
                    parity_ms = float(line.split()[1])
            if parity_ms is not None:
                _stamp(f"parity mode: {parity_ms:.1f} ms/step")
                break
            _stamp(f"parity mode produced no number (rc={proc.returncode})")
        except subprocess.TimeoutExpired:
            _stamp(f"parity mode exceeded {PARITY_BUDGET_S}s budget")
        except Exception as e:
            _stamp(f"parity mode failed ({type(e).__name__})")
    if parity_ms is None:
        parity_ms = LAST_KNOWN_PARITY_MS
        parity_stale = True
        _stamp(f"parity: falling back to last committed warm number "
               f"{parity_ms} ms (stale)")

    cb = cost.get(best_b, {})
    mfu = (cb.get("flops", 0.0) / dt_best) / V5E_PEAK_FLOPS if on_tpu else 0.0
    hbm_gbs = cb.get("bytes", 0.0) / dt_best / 1e9

    print(
        json.dumps(
            {
                "metric": "tracking-60k train points/sec/chip",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / A100_TRAIN_POINTS_PER_SEC, 3),
                # headline = the accuracy-first hept_acc arm
                # (nh2r8bs512cv2r since round 5); its 60k acc@0.9 evidence
                # lives in BASELINE.md round-5 section + runs/r5 logs
                # (3-seed campaign: 0.9554/0.9527/0.9459 @ 25 ep)
                "arm": "hept_acc/nh2r8bs512cv2r",
                "acc_at_0p9_seed42": 0.9554,
                "batch_events": best_b,
                "step_ms": round(dt_best * 1e3, 2),
                "step_ms_b1": round(dt1 * 1e3, 2),
                "step_ms_fast": round(fast_ms, 2) if fast_ms else None,
                "pts_per_s_fast": round(N_POINTS / fast_ms * 1e3, 1)
                if fast_ms else None,
                "fast_arm": "hept_fast/nh2r8cv2r (acc@0.9 0.9341)",
                "step_ms_parity": round(parity_ms, 2) if parity_ms else None,
                "step_ms_parity_stale": parity_stale,
                "fwd_ms": round(fwd_ms, 2),
                "step_ms_6k_b8": round(step6k_ms, 2) if step6k_ms else None,
                "pts_per_s_6k_b8": round(pps6k, 1) if pps6k else None,
                "mfu": round(mfu, 4),
                "hbm_gb_per_s": round(hbm_gbs, 1),
                "flops_per_step": cb.get("flops", 0.0),
                "bytes_per_step": cb.get("bytes", 0.0),
                "backend": jax.default_backend(),
                "loss": loss_best,
            }
        )
    )


if __name__ == "__main__":
    main()
