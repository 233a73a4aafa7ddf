"""Minimal HEPT quickstart (the `example/` tree equivalent).

Trains a small HEPT transformer on a synthetic tracking dataset, evaluates
retrieval metrics, and times one inference pass — mirroring the reference's
example/trainer.py + example.ipynb flow, TPU-style.

Run: python examples/hept_example.py [--points 6000] [--epochs 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=6000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--events", type=int, default=8)
    args = ap.parse_args()

    from hept_tpu.data.batching import pack_events
    from hept_tpu.data.synthetic import synthetic_tracking_event
    from hept_tpu.models import HeptTransformer, TransformerConfig
    from hept_tpu.train.losses import infonce_loss
    from hept_tpu.train.metrics import acc_and_pr_at_k, point_filter

    rng = np.random.default_rng(0)
    events = [synthetic_tracking_event(rng, n_points=args.points) for _ in range(args.events)]
    e_max = max(ev.pairs.shape[1] for ev in events)
    batches = [pack_events([ev], block_size=100, e_max=e_max) for ev in events]

    cfg = TransformerConfig(
        in_dim=events[0].x.shape[1],
        coords_dim=events[0].coords.shape[1],
        task="tracking",
        padding_mode="replicate",
        attn_impl="pallas" if jax.default_backend() == "tpu" else "xla",
    )
    model = HeptTransformer(cfg)
    b0 = batches[0]
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["x"][0]), jnp.asarray(b0["coords"][0]), jnp.asarray(b0["valid"][0]),
    )
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, batch):
        def loss_of(p):
            out = model.apply(
                {"params": p, "constants": variables["constants"]},
                batch["x"], batch["coords"], batch["valid"],
            )
            return infonce_loss(
                out, batch["pairs"], batch["pair_mask"], batch["cluster_ids"],
                batch["recons"], batch["pts"],
            )

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    jb = [
        {k: jnp.asarray(v[0]) for k, v in b.items()} for b in batches
    ]
    for epoch in range(args.epochs):
        losses = []
        for batch in jb[:-1]:
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    # eval on the held-out event
    test = jb[-1]
    final = {"params": params, "constants": variables["constants"]}
    out = model.apply(final, test["x"], test["coords"], test["valid"])
    mask = point_filter(test["cluster_ids"], test["recons"], test["pts"], 0.9) & test["valid"]
    acc, prec, rec = acc_and_pr_at_k(out, test["cluster_ids"], mask, valid=test["valid"])
    print(f"test accuracy@0.9={acc:.4f} precision={prec:.4f} recall={rec:.4f}")

    # inference timing (example.ipynb cells 9-10 equivalent)
    fwd = jax.jit(lambda x, c, v: model.apply(final, x, c, v))
    o = fwd(test["x"], test["coords"], test["valid"])
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = fwd(test["x"], test["coords"], test["valid"])
    jax.block_until_ready(o)
    print(f"inference: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms / event")


if __name__ == "__main__":
    main()
