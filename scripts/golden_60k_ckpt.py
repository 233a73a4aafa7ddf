"""Full-scale (>60k-point) golden parity of the shipped reference checkpoint.

The reference's own accuracy evidence is `example/example.ipynb` cells 6-10:
the shipped `tracking-60k-model.pt` evaluated on a >60k-point event. The real
Zenodo event is unreachable here (zero egress), so this script runs the same
comparison the test-suite goldens (tests/test_convert.py) run at n<=6000, at
the notebook's full scale n=61440: identical synthetic inputs through

  * the importable torch reference (`/root/reference/example/transformer.py`,
    shipped checkpoint, CPU), and
  * our HeptTransformer via utils/convert.load_reference_checkpoint
    (reference-parity config: attn_impl=xla, no fast-mode divergences),

and reports the relative-error distribution plus the kNN-retrieval overlap of
the two embedding sets (does our embedding retrieve the same neighbors the
reference's does? — the quantity the tracking metric is built from,
reference src/utils/metrics.py:24-62).

Run (CPU, ~minutes): python scripts/golden_60k_ckpt.py [n_points]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax

# CPU backend, forced before device init: this host's sitecustomize
# registers a TPU tunnel backend that env vars alone don't override, and
# the comparison belongs on CPU (the TPU may be busy with training arms).
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_convert import CKPT, _event, _golden_cfg, _load_reference_model  # noqa: E402


def main(n: int = 61400) -> None:
    assert CKPT.exists(), "reference checkpoint missing"
    assert n % 100 == 0, "n must be a multiple of block_size=100"
    import torch

    import jax.numpy as jnp

    from hept_tpu.models import HeptTransformer
    from hept_tpu.utils.convert import load_reference_checkpoint

    ref_model, in_dim, coords_dim = _load_reference_model()
    x, coords = _event(7, n, in_dim, coords_dim)

    t0 = time.perf_counter()
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(x), torch.from_numpy(coords),
            torch.zeros(n, dtype=torch.long),
        ).numpy()
    t_ref = time.perf_counter() - t0
    print(f"torch reference forward: {t_ref:.1f}s", flush=True)

    model = HeptTransformer(_golden_cfg(in_dim, coords_dim))
    variables = load_reference_checkpoint(str(CKPT))
    t0 = time.perf_counter()
    out = np.asarray(
        model.apply(variables, jnp.asarray(x), jnp.asarray(coords),
                    jnp.ones(n, bool))
    )
    t_ours = time.perf_counter() - t0
    print(f"jax forward (cpu, incl. compile): {t_ours:.1f}s", flush=True)

    rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1.0)
    print(
        f"rel err: median {np.median(rel):.2e}  p80 {np.percentile(rel, 80):.2e}"
        f"  p99 {np.percentile(rel, 99):.2e}  frac<1e-2 {(rel < 1e-2).mean():.4f}",
        flush=True,
    )

    # kNN-retrieval overlap: for a sample of anchors, do the K nearest
    # neighbours under our embedding match the reference's? (The tracking
    # metric scores exactly these neighbour sets.)
    k = 19
    rng = np.random.default_rng(0)
    anchors = rng.choice(n, size=2048, replace=False)

    def knn(emb):
        d = np.linalg.norm(emb[anchors, None, :] - emb[None, :, :], axis=-1)
        d[np.arange(len(anchors)), anchors] = np.inf
        return np.argpartition(d, k, axis=1)[:, :k]

    nn_ref = knn(ref_out)
    nn_ours = knn(out)
    overlap = np.mean(
        [len(np.intersect1d(a, b)) / k for a, b in zip(nn_ref, nn_ours)]
    )
    print(f"GOLDEN60K n={n} knn@{k} overlap {overlap:.4f} "
          f"median_rel {np.median(rel):.2e}", flush=True)

    # Measured (2026-08-18, CPU): median rel 3.46e-07 — the bulk is
    # bitwise-grade identical, so the checkpoint mapping and model wiring
    # are exact at full scale. p99 0.145 / overlap 0.9642: fp sort-tie
    # flips (hash keys within f32 noise ordering differently between torch
    # argsort and XLA sort) contaminate a couple of buckets each and four
    # layers spread them (tests/test_convert.py::_assert_golden documents
    # the same two-regime structure at n=997/6000).
    assert np.median(rel) < 1e-5, "bulk mismatch — wiring divergence"
    assert overlap > 0.95, "retrieval sets diverge beyond fp-tie noise"
    print("OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 61400)
