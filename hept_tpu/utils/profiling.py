"""Profiling + debugging harness (SURVEY §5 aux subsystems).

The reference's only profiling is an fvcore FLOP table and a notebook
`torch.utils.benchmark` cell. Here: a `block_until_ready` timing harness with
result-cache-defeating input perturbation (some remote backends memoize
identical calls), optional `jax.profiler` traces, and a checkify-based
NaN-guard wrapper for debugging training steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2, perturb=None):
    """Median-free simple timing: mean ms/iter after warmup.

    `perturb(args, i)` may return fresh arguments per iteration to defeat
    value-level result caching in tunnel backends.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        it_args = perturb(args, i) if perturb is not None else args
        out = fn(*it_args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


@contextlib.contextmanager
def trace(log_dir: str | None):
    """`jax.profiler.trace` wrapper that no-ops when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named trace span (`jax.profiler.TraceAnnotation`)."""
    return jax.profiler.TraceAnnotation(name)


def checkify_nan_guard(fn: Callable):
    """Wrap a jittable function so NaN/Inf production raises with location
    info (the TPU answer to the reference's cudnn-determinism +
    `MeanMetric(nan_strategy="error")` guards)."""
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapped
