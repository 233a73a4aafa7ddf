"""Tracking-6k stacked-flat-batch B sweep on TPU.

bench.py's 6k line uses B=8 (events ride the bucket sorts as separate
batch rows — linear in B). At small n the per-sort-call latency floor
dominates, so larger B may keep amortizing. Sweeps B in {8, 16, 32} with
the bench headline config and prints per-B step time + pts/s; the best B
goes into bench.py's 6k line.

Usage: python scripts/probe_6k_batch.py [B ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
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

N = 6_000
WARMUP = 3
ITERS = 15


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    events = [
        synthetic_tracking_event(rng, n_points=N, avg_track_size=8,
                                 pairs_per_point=16)
        for _ in range(max(bs))
    ]
    tx = make_optimizer("adam", lr=1e-2)

    for b in bs:
        cfg = TransformerConfig(
            in_dim=events[0].x.shape[1], coords_dim=events[0].coords.shape[1],
            task="tracking", h_dim=24, num_heads=8, n_layers=4,
            block_size=100, n_hashes=2, num_regions=150, num_w_per_dist=10,
            padding_mode="replicate",
            attn_impl="hybrid2" if on_tpu else "xla",
            scan_layers=True, sort_pack=True, sort_ops=8, qkv_post_sort=True,
            unsort_pack=True, shared_sort=True, share_heads=True,
            kernel_bf16=True, static_keys="x0", static_rounds=8,
            sort_events=b,
        )
        model = HeptTransformer(cfg)
        batch = pack_events(events[:b], block_size=100, window_pairs=128)
        keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids",
                "recons", "pts", "pair_rev", "pair_weight", "pair_neg")
        bt = {k: jnp.asarray(batch[k]) for k in keys}
        flat_apply = make_flat_batched_apply(model)

        @jax.jit
        def train_step(state, bt):
            def loss_of(p):
                out = flat_apply(
                    {"params": p, "constants": state.constants},
                    bt["x"], bt["coords"], bt["valid"],
                )
                losses = [
                    infonce_loss(
                        out[i], bt["pairs"][i], bt["pair_mask"][i],
                        bt["cluster_ids"][i], bt["recons"][i], bt["pts"][i],
                        windowed_pairs=True, pair_rev=bt["pair_rev"][i],
                        pair_weight=bt["pair_weight"][i],
                        pair_neg=bt["pair_neg"][i],
                    )
                    for i in range(b)
                ]
                return sum(losses) / len(losses)

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), loss

        try:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), bt["x"][0], bt["coords"][0],
                bt["valid"][0]
            )
            jax.block_until_ready(variables)
            state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
            t0 = time.perf_counter()
            state, loss = train_step(state, bt)
            float(loss)
            print(f"B={b}: compile+first {time.perf_counter()-t0:.1f}s",
                  flush=True)
            for _ in range(WARMUP - 1):
                state, loss = train_step(state, bt)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                state, loss = train_step(state, bt)
            final = float(loss)
            dt = (time.perf_counter() - t0) / ITERS
            print(f"STEP6K_MS B={b} {dt*1e3:.2f} pts/s {b*N/dt:,.0f} "
                  f"loss {final:.4f}", flush=True)
        except Exception as e:
            print(f"B={b} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
