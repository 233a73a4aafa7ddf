"""FLOP / cost analysis via XLA (replaces the reference's fvcore table,
src/utils/get_model.py:30-48)."""

from __future__ import annotations

import jax


def cost_analysis(fn, *example_args, **example_kwargs) -> dict:
    """Compile `fn` and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # some backends return a per-computation list
        ca = ca[0]
    out = {k: v for k, v in ca.items() if isinstance(v, (int, float))}
    out["params"] = None
    return out


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
