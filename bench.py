"""Benchmark: tracking-60k training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "points/sec/chip", "vs_baseline": N}

Baseline: the reference repo records no numbers (BASELINE.md). We benchmark
the same workload the reference's example notebook times (one >60k-point
event, reference hyperparameters block_size=100/n_hashes=3/8 heads/4 layers)
but as a full *training* step (fwd + bwd + adam). `vs_baseline` is computed
against A100_TRAIN_POINTS_PER_SEC below — an estimate for the PyTorch
reference on A100 documented in BASELINE.md; replace with a measured value
when GPU hardware is available.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Estimated PyTorch-reference A100 training throughput for tracking-60k
# (batch_size=1, fp32/tf32). See BASELINE.md "Throughput baseline assumption".
A100_TRAIN_POINTS_PER_SEC = 1.0e6

N_POINTS = 60_000
WARMUP = 3
ITERS = 20


def main():
    import jax

    try:  # persistent compile cache cuts tunnel-compile latency across runs
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.config import ExperimentConfig
    from hept_tpu.train.losses import infonce_loss
    from hept_tpu.train.optim import make_optimizer
    from hept_tpu.train.state import TrainState
    import optax

    on_tpu = jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    ev = synthetic_tracking_event(
        rng, n_points=N_POINTS, avg_track_size=8, pairs_per_point=16
    )
    batch = pack_events([ev], block_size=100)

    cfg = TransformerConfig(
        in_dim=ev.x.shape[1],
        coords_dim=ev.coords.shape[1],
        task="tracking",
        h_dim=24,
        num_heads=8,
        n_layers=4,
        block_size=100,
        n_hashes=3,
        num_regions=150,
        num_w_per_dist=10,
        padding_mode="replicate",
        attn_impl="pallas" if on_tpu else "xla",
        scan_layers=True,
        sort_pack=True,  # bf16-packed sort payloads (validated: converges
        # identically to f32 on this workload; see BASELINE.md round-1 notes)
        sort_ops=8,  # 8 payload operands per sort call (less key traffic)
    )
    model = HeptTransformer(cfg)
    # IMPORTANT: the batch is passed to the jitted step as ARGUMENTS, never
    # captured in the closure — closure-captured device arrays are embedded
    # into the lowered module as constants, which costs minutes on a remote
    # backend (measured: lower() 496s closure vs 1.5s as args at 60k points).
    keys = ("x", "coords", "valid", "pairs", "pair_mask", "cluster_ids",
            "recons", "pts")
    bt = {k: jnp.asarray(batch[k][0]) for k in keys}

    def _stamp(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    _stamp("data ready; initializing model (jitted init)")
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), bt["x"], bt["coords"], bt["valid"]
    )
    jax.block_until_ready(variables)
    _stamp("init done; building optimizer")
    tx = make_optimizer("adam", lr=1e-2)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))

    @jax.jit
    def train_step(state, bt):
        def loss_of(params):
            out = model.apply(
                {"params": params, "constants": state.constants},
                bt["x"], bt["coords"], bt["valid"],
            )
            return infonce_loss(
                out, bt["pairs"], bt["pair_mask"], bt["cluster_ids"],
                bt["recons"], bt["pts"],
            )

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss

    # compile + warmup. NOTE: timing boundaries fetch the loss scalar to
    # host — on the remote TPU backend block_until_ready can return before
    # execution completes, so a device->host value read is the only reliable
    # fence (float() forces it).
    _stamp("compiling train step")
    state, loss = train_step(state, bt)
    float(loss)
    _stamp("train step compiled")
    for _ in range(WARMUP - 1):
        state, loss = train_step(state, bt)
    float(loss)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = train_step(state, bt)
    final_loss = float(loss)
    dt = (time.perf_counter() - t0) / ITERS

    # forward-only latency (reference example.ipynb cells 9-10 equivalent)
    fwd = jax.jit(
        lambda p, c, bt: model.apply(
            {"params": p, "constants": c}, bt["x"], bt["coords"], bt["valid"]
        )
    )
    out = fwd(state.params, state.constants, bt)
    float(out.sum())
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fwd(state.params, state.constants, bt)
    float(out.sum())
    fwd_ms = (time.perf_counter() - t0) / ITERS * 1e3

    pps = N_POINTS / dt
    print(
        json.dumps(
            {
                "metric": "tracking-60k train points/sec/chip",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / A100_TRAIN_POINTS_PER_SEC, 3),
                "step_ms": round(dt * 1e3, 2),
                "fwd_ms": round(fwd_ms, 2),
                "backend": jax.default_backend(),
                "loss": final_loss,
            }
        )
    )


if __name__ == "__main__":
    main()
