"""Train the headline fast config on synthetic tracking-60k to a real
retrieval metric on TPU — the end-to-end evidence run for the 60k workload
(trainer harness, flat batching, windowed fast loss, hybrid kernels).

Usage: python scripts/train_60k_demo.py [variant]
  variant: full (default: static_keys + canon) | static (static_keys only)
         | r2stack (share_heads/kernel_bf16, no static_keys)
"""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hept_tpu.data.datasets import make_synthetic_tracking
from hept_tpu.train.config import ExperimentConfig
from hept_tpu.train.trainer import run_one_seed

VARIANTS = {
    "full": dict(static_keys="x0", canon_residual=True),
    "static": dict(static_keys="x0"),
    "coords": dict(static_keys="coords", canon_residual=True),
    "r2stack": dict(),
    "noshare": dict(share_heads=False),  # round-2 stack + kernel_bf16
    "nokb": dict(kernel_bf16=False),  # share_heads without bf16 kernels
    # exact round-2 demo stack (9ba387c reached 0.9552 at 60k) on CURRENT
    # code — regression control: the base path was refactored since (static
    # plan plumbing, chunked sorts, stacked flat batching)
    "r2known": dict(share_heads=False, kernel_bf16=False),
    # r2known + the round-4 EXACT transport levers (gather_sort + dynamic
    # row unsort): same math, so r2known's 0.9566 convergence evidence
    # carries — a timer alone moves the parity-accuracy Pareto point
    "r2knownr": dict(share_heads=False, kernel_bf16=False,
                     unsort_rows=True),
    "r2knowngr": dict(share_heads=False, kernel_bf16=False,
                      gather_sort=True, unsort_rows=True),
    # r2stack on pure-XLA attention: isolates the Pallas hybrid backward
    # without the static stack
    "r2xla": dict(_attn_impl="xla"),
    # static hash with an AND-composed second quantized direction — the
    # candidate fix for the 60k static divergence (bucket locality)
    "fullb4": dict(static_keys="x0", canon_residual=True, static_and_bins=4),
    "fullb8": dict(static_keys="x0", canon_residual=True, static_and_bins=8),
    "coordsb4": dict(static_keys="coords", canon_residual=True,
                     static_and_bins=4),
    # 6-round static plan, layers cycle 3-round subsets — restores the
    # multi-layer round-union coverage (probe_cobucket.py: 0.968 vs 0.879)
    "r6": dict(static_keys="x0", static_rounds=6),
    "r6b4": dict(static_keys="x0", static_rounds=6, static_and_bins=4),
    "r12": dict(static_keys="x0", static_rounds=12),
    # per-layer OR width 2 with 8-round union: kernel+unsort cost ∝
    # n_hashes, coverage rides the cross-layer union (0.98 at 8 rounds)
    "nh2r8": dict(static_keys="x0", static_rounds=8, n_hashes=2),
    # isolate kernel_bf16 x static interaction (full stack, f32 kernels)
    "fullnokb": dict(static_keys="x0", canon_residual=True,
                     kernel_bf16=False),
    # pinned-round-0 canon + 9-round union: every layer keeps the free
    # canonical round, rounds 1-8 cycle 2-per-layer — canon cost with
    # near-reference coverage (probe: 9-round union 0.984)
    "r9canon": dict(static_keys="x0", canon_residual=True, static_rounds=9),
    "r9canonb4": dict(static_keys="x0", canon_residual=True,
                      static_rounds=9, static_and_bins=4),
    # isolate the Pallas hybrid backward: full static stack on pure-XLA
    # attention (the CPU repro converges on xla; TPU diverges on hybrid)
    "fullxla": dict(static_keys="x0", canon_residual=True,
                    _attn_impl="xla"),
    # gradient-clipping stabilizer arms: the 60k collapse (incl. the r2stack
    # control) looks like an lr=1e-2 instability — test whether global-norm
    # clipping alone restores convergence on each stack
    "r2clip": dict(_clip=1.0),
    "fullclip": dict(static_keys="x0", canon_residual=True, _clip=1.0),
    "r9clip": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                   _clip=1.0),
    "r2lr3": dict(_lr=3e-3),  # lower-lr control on the r2stack
    # kernel_center arms: per-bucket RPE centering (precision fix for the
    # bf16 rounding-noise mechanism; see TransformerConfig.kernel_center)
    "r2c": dict(kernel_center=True),  # r2stack + centering
    "fullc": dict(static_keys="x0", canon_residual=True, kernel_center=True),
    "r9canonc": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                     kernel_center=True),
    # center + row-major canonical unsort (layout-only on top of fullc)
    "fullcr": dict(static_keys="x0", canon_residual=True, kernel_center=True,
                   unsort_rows=True),
    "r9cr": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                 kernel_center=True, unsort_rows=True),
    # row-major canonical unsort WITHOUT centering (exact layout-only change
    # on top of the full stack; probe_unsort_row.py: ~2x the unsort wall)
    "fullr": dict(static_keys="x0", canon_residual=True, unsort_rows=True),
    "r9r": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                unsort_rows=True),
    # bf16-operand v2 backward (f32-grade numerics at bf16-MXU cost;
    # _bwd_cols_kernel_v2) on the full stack
    "fullv2": dict(static_keys="x0", canon_residual=True,
                   _attn_impl="hybrid2"),
    "fullrv2": dict(static_keys="x0", canon_residual=True, unsort_rows=True,
                    _attn_impl="hybrid2"),
    # 9-round static plan (coverage recovery) + rows + v2: the accuracy-and-
    # speed headline candidate
    "r9rv2": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                  unsort_rows=True, _attn_impl="hybrid2"),
    "r9crv2": dict(static_keys="x0", canon_residual=True, static_rounds=9,
                   kernel_center=True, unsort_rows=True,
                   _attn_impl="hybrid2"),
    # nh2r8 compositions: OR width 2, 8-round cross-layer union (converged
    # 0.9334 at 130.7 ms) + the v2 backward; the canon/rows variant pins
    # round 0 so the union drops to 5 rounds (accuracy risk, speed win)
    "nh2r8v2": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                    _attn_impl="hybrid2"),
    "nh2r5crv2": dict(static_keys="x0", static_rounds=5, n_hashes=2,
                      canon_residual=True, kernel_center=True,
                      unsort_rows=True, _attn_impl="hybrid2"),
    # block_size=128 + flat-slab kernels (slab2): buckets are 128-lane
    # aligned so g consecutive buckets read as one contiguous lane slice —
    # one masked (S,S) MXU dot replaces the serial per-bucket chain with
    # NO HBM relayout. Bigger buckets = a validated divergence (more
    # neighbors per point; bench arm decides accuracy).
    "bs128rv2": dict(static_keys="x0", canon_residual=True, unsort_rows=True,
                     block_size=128, _attn_impl="slab2"),
    "nh2r8bs128": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                       block_size=128, _attn_impl="slab2"),
    # bs128 composed with center / non-canon rows (headline candidates:
    # the bs128 arm scored 0.9391 @ 124.6 ms vs bs100's 0.9341 @ 124.5 —
    # bigger buckets buy recall at the same step cost via slab2 kernels)
    "nh2r8bs128c": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                        block_size=128, kernel_center=True,
                        _attn_impl="slab2"),
    "nh2r8bs128cr": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                         block_size=128, kernel_center=True,
                         unsort_rows=True, _attn_impl="slab2"),
    # accuracy-recovery candidates on the headline stack:
    # nh2r8v2 + per-bucket RPE centering (centering was worth ~+0.3 on the
    # 9-round stack at ~zero step cost)
    "nh2r8cv2": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                     kernel_center=True, _attn_impl="hybrid2"),
    # headline + row-gather unsort WITHOUT canon (every round gathers by its
    # own static inverse permutation) — an EXACT layout change
    # (tests/test_unsort_rows.py::test_unsort_rows_non_canon), so a timer
    # alone decides; no convergence arm needed.
    "nh2r8cv2r": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                      kernel_center=True, unsort_rows=True,
                      _attn_impl="hybrid2"),
    # fori_loop kernel scheduling (g-lift): hybrid2l = loop v2 backward
    # (EXACT v2 math, timer-only); loop2 = loop fwd + loop bwd (fwd bias
    # transport differs at ~bf16² — needs a 60k arm if its timer wins)
    "nh2r8cv2l": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                      kernel_center=True, _attn_impl="hybrid2l"),
    "nh2r8cv2L2": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                       kernel_center=True, _attn_impl="loop2"),
    # loop scheduling + non-canon row unsort combined (the candidate next
    # headline if both timers win)
    "nh2r8cv2rl": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                       kernel_center=True, unsort_rows=True,
                       _attn_impl="hybrid2l"),
    # full 12-round union (reference-level co-bucket recall 0.988,
    # probe_cobucket.py) at n_hashes=3 + center + v2 backward; no canon
    # (12 rounds exceeds the pinned-round-0 budget) so no unsort_rows
    "r12cv2": dict(static_keys="x0", static_rounds=12, kernel_center=True,
                   _attn_impl="hybrid2"),
    # r12cv2 + non-canon row-gather unsort (exact layout change; timer-only)
    "r12cv2r": dict(static_keys="x0", static_rounds=12, kernel_center=True,
                    unsort_rows=True, _attn_impl="hybrid2"),
    # OR width 1: each layer a single static round (4 rounds used/step) —
    # kernel+unsort cost halves again vs nh2, but per-layer co-bucket
    # recall drops to ~0.52 and the 4-round union to 0.920
    # (probe_cobucket at 60k). Pareto-mapping arm: speed point whose
    # accuracy cost decides whether an OR1 mode is ever offerable.
    "nh1r4v2": dict(static_keys="x0", static_rounds=4, n_hashes=1,
                    _attn_impl="hybrid2"),
    "nh1r4cv2": dict(static_keys="x0", static_rounds=4, n_hashes=1,
                     kernel_center=True, _attn_impl="hybrid2"),
    # nh1 + rows (exact layout change on the nh1 stack; timer-only if the
    # nh1r4cv2 arm holds — the OR1 speed point with the rows unsort win)
    "nh1r4cv2r": dict(static_keys="x0", static_rounds=4, n_hashes=1,
                      kernel_center=True, unsort_rows=True,
                      _attn_impl="hybrid2"),
    # bs128 slab2 + center + rows at OR2/8 rounds was queued in queue20; the
    # nh2r8bs128cr timer decides whether it displaces nh2r8cv2r on accuracy
    # at equal speed. bs128 composed with nh1 (speed-max candidate):
    "nh1r4bs128cr": dict(static_keys="x0", static_rounds=4, n_hashes=1,
                         block_size=128, kernel_center=True,
                         unsort_rows=True, _attn_impl="slab2"),
    # ---- round-4 accuracy-composition arms (VERDICT r3 next #1): compose
    # ALL the known accuracy levers at full strength — 12/16-round static
    # union (reference-level co-bucket recall), bs128 slab2 kernels (+0.4-0.5
    # pt at equal step cost), per-bucket centering, row-gather unsort —
    # targeting a 3-seed mean >= 0.95 acc@0.9 at <= 150 ms.
    "r12bs128cv2r": dict(static_keys="x0", static_rounds=12, block_size=128,
                         kernel_center=True, unsort_rows=True,
                         _attn_impl="slab2"),
    # TRANSPORT GROUPS on the acc arm: g points per gathered row (group-
    # level plan permutations, residual in round-0 sorted order) — the
    # round-5 lever on the issue-rate-bound ~68 ms transport wall (g× fewer
    # gathered rows fwd+bwd). Convergence-gated: bucket composition
    # coarsens to σ-adjacent g-clusters (probe_cobucket.py groups).
    "r12bs128cv2rg2": dict(static_keys="x0", static_rounds=12,
                           block_size=128, kernel_center=True,
                           unsort_rows=True, transport_groups=2,
                           _attn_impl="slab2"),
    "r12bs128cv2rg4": dict(static_keys="x0", static_rounds=12,
                           block_size=128, kernel_center=True,
                           unsort_rows=True, transport_groups=4,
                           _attn_impl="slab2"),
    # groups on the speed headline (nh2r8cv2r + bs128 kernels)
    "nh2r8bs128cv2rg4": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                             block_size=128, kernel_center=True,
                             unsort_rows=True, transport_groups=4,
                             _attn_impl="slab2"),
    # BIG BUCKETS (round-5): co-bucket recall rises with block_size at FIXED
    # transport cost — bs256 takes the 8-round union to 0.9902 (= the
    # r12bs128 acc arm's union) and bs512 to 0.9960 (probe_bs, runs/r5) —
    # while block size only costs MXU FLOPs (slab kernels, not the wall).
    # The TPU roofline trade: spend abundant FLOPs to avoid scarce
    # transport. nh2 keeps transport at 8 round-instances/step.
    "nh2r8bs256cv2r": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                           block_size=256, kernel_center=True,
                           unsort_rows=True, _attn_impl="slab2"),
    "nh2r8bs384cv2r": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                           block_size=384, kernel_center=True,
                           unsort_rows=True, _attn_impl="slab2"),
    "nh2r8bs512cv2r": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                           block_size=512, kernel_center=True,
                           unsort_rows=True, _attn_impl="slab2"),
    "r12bs256cv2r": dict(static_keys="x0", static_rounds=12,
                         block_size=256, kernel_center=True,
                         unsort_rows=True, _attn_impl="slab2"),
    # accuracy-max candidate: 12-round union x OR3 at bs512 (union 0.9966,
    # per-layer OR3 0.9873) at ~the r12bs128 step cost (slab kernels are
    # bucket-size-free)
    "r12bs512cv2r": dict(static_keys="x0", static_rounds=12,
                         block_size=512, kernel_center=True,
                         unsort_rows=True, _attn_impl="slab2"),
    # OR1 turbo at bs512: 4-round union recall 0.920 (bs100) -> 0.9906
    # (bs512, probe_morton2) — the ~55 ms class arm at near-acc-arm union
    "nh1r4bs512cv2r": dict(static_keys="x0", static_rounds=4, n_hashes=1,
                           block_size=512, kernel_center=True,
                           unsort_rows=True, _attn_impl="slab2"),
    # big buckets x transport groups (Morton-σ: spatially tight groups):
    # g=2 halves / g=4 quarters the 8-instance transport while the wide
    # bucket absorbs the group-rank displacement — union recall 0.9934 /
    # 0.9901 vs 0.9960 ungrouped (runs/r5/probe_sigma.log morton grid)
    "nh2r8bs512cv2rg2": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                             block_size=512, kernel_center=True,
                             unsort_rows=True, transport_groups=2,
                             _attn_impl="slab2"),
    "nh2r8bs512cv2rg4": dict(static_keys="x0", static_rounds=8, n_hashes=2,
                             block_size=512, kernel_center=True,
                             unsort_rows=True, transport_groups=4,
                             _attn_impl="slab2"),
    # 16-round union at OR width 4: more per-layer OR coverage than the
    # reference's 3 (union recall saturates ~0.99); kernel+unsort cost ∝
    # n_hashes so ~4/3 of the r12 arm's step.
    "r16bs128cv2r": dict(static_keys="x0", static_rounds=16, n_hashes=4,
                         block_size=128, kernel_center=True,
                         unsort_rows=True, _attn_impl="slab2"),
    "r16cv2r": dict(static_keys="x0", static_rounds=16, n_hashes=4,
                    kernel_center=True, unsort_rows=True,
                    _attn_impl="hybrid2"),
    # contingency accuracy levers on the composed arm (if the 3-seed mean
    # misses 0.95): AND-composed second hash direction (+0.02-0.03 co-bucket
    # union at 60k, PARITY.md) / global-norm clipping (seed-variance
    # stabilizer; the lr=1e-2 recipe is collapse-prone)
    "r12bs128cv2rb4": dict(static_keys="x0", static_rounds=12,
                           block_size=128, kernel_center=True,
                           unsort_rows=True, static_and_bins=4,
                           _attn_impl="slab2"),
    "r12bs128cv2rclip": dict(static_keys="x0", static_rounds=12,
                             block_size=128, kernel_center=True,
                             unsort_rows=True, _clip=1.0,
                             _attn_impl="slab2"),
    # 13-round PINNED-canon plan (13 = 1 + 6*(nh-1)): the canonical round
    # is free in every layer (no x-gather, no unsort — cuts the per-layer
    # unsort/gather count by 1/3) while the union stays 13 rounds >= r12's
    # coverage. The speed-recovery candidate for the hept_acc profile.
    "r13bs128ccv2r": dict(static_keys="x0", static_rounds=13,
                          canon_residual=True, block_size=128,
                          kernel_center=True, unsort_rows=True,
                          _attn_impl="slab2"),
    # reference-parity mode (ALL validated divergences off — the bench.py
    # --parity-only config): per-head per-layer hashing, independent q/k
    # bucket sorts, f32 sort/unsort transport, f32 kernels. As a VARIANTS
    # entry so profile_step_decomp / time_step_variant can decompose it
    # (VERDICT r3 next #6: optimize parity to <= 400 ms).
    "parity": dict(sort_pack=False, sort_ops=1, unsort_pack=False,
                   shared_sort=False, share_heads=False, kernel_bf16=False,
                   static_keys=False, n_hashes=3, _attn_impl="hybrid"),
    # parity + EXACT transport levers (bit-compatible with reference
    # semantics; round-4 attribution arms for the <=400 ms parity target):
    # r = row-gather unsort (dynamic per-head inverses), g = gather_sort
    # (argsorted keys + broadcast-source row gathers for the q/k payload)
    "parityr": dict(sort_pack=False, sort_ops=1, unsort_pack=False,
                    shared_sort=False, share_heads=False, kernel_bf16=False,
                    static_keys=False, n_hashes=3, unsort_rows=True,
                    _attn_impl="hybrid"),
    "parityg": dict(sort_pack=False, sort_ops=1, unsort_pack=False,
                    shared_sort=False, share_heads=False, kernel_bf16=False,
                    static_keys=False, n_hashes=3, gather_sort=True,
                    _attn_impl="hybrid"),
    "paritygr": dict(sort_pack=False, sort_ops=1, unsort_pack=False,
                     shared_sort=False, share_heads=False, kernel_bf16=False,
                     static_keys=False, n_hashes=3, gather_sort=True,
                     unsort_rows=True, _attn_impl="hybrid"),
}
def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-2
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    # dataset size (VERDICT r3 next #7: scale the convergence evidence
    # beyond the 10-event toy — 50 events gives 40 train / 5 valid / 5 test)
    n_events = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    epochs = int(sys.argv[5]) if len(sys.argv) > 5 else 25

    ds = make_synthetic_tracking(n_events=n_events, n_points=60_000, seed=0,
                                 avg_track_size=8, pairs_per_point=16)

    vk = dict(VARIANTS[variant])
    attn_impl = vk.pop("_attn_impl", "hybrid")  # cfg-level, not a model kwarg
    clip_norm = vk.pop("_clip", 0.0)
    lr = vk.pop("_lr", lr)

    cfg = ExperimentConfig(
        task="tracking",
        seed=seed,
        model_kwargs={
            **dict(
                block_size=100, n_hashes=3, num_regions=150, num_heads=8,
                h_dim=24, n_layers=4, num_w_per_dist=10, sort_pack=True,
                sort_ops=8, qkv_post_sort=True, scan_layers=True,
                unsort_pack=True, shared_sort=True, share_heads=True,
                kernel_bf16=True,
            ),
            **vk,  # may override base keys (e.g. n_hashes)
        },
        optimizer_kwargs={"lr": lr, "clip_norm": clip_norm},
        lr_scheduler_name="step",
        lr_scheduler_kwargs={"step_size": 500, "gamma": 0.5},
        num_epochs=epochs,
        batch_size=1,
        batch_mode="flat",
        n_devices=1,
        main_metric="accuracy@0.9",
        mode="max",
        log_dir="/tmp/train60k",
        attn_impl=attn_impl,
        # one extra eval compile/run per demo; catches shape-specific
        # wrong-results in the compiled eval program (ROADMAP RE-DIAGNOSED)
        eval_shape_check=True,
    )
    res = run_one_seed(cfg, dataset=ds)
    print(f"RESULT tracking-60k [{variant} lr={lr:g} seed={seed} n={n_events}x{epochs}ep]: "
          f"acc@0.9={res['accuracy@0.9']:.4f} "
          f"recall@0.9={res['recall@0.9']:.4f} "
          f"prec@0.9={res.get('precision@0.9', float('nan')):.4f} "
          f"loss={res['loss']:.4f}", flush=True)


if __name__ == "__main__":
    main()
