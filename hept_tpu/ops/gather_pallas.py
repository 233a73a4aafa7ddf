"""Pallas TPU row-gather kernels — candidates for the unsort transport wall.

The per-round [num|denom] unsort and the x-side sort transport move
(60k, 400 B) rows through XLA gathers at an observed ~13-15 ns PER ROW
regardless of row width (probe_unsort_r4: 400 B rows at ~30 GB/s, 48 B
column rows at ~2.5 GB/s — the same ~70 M rows/s floor).  These kernels
test the two ways around a per-row floor:

  * `row_gather_vreg` — in-VMEM vector gather (`tpu.dynamic_gather` via
    ``jnp.take_along_axis`` along the sublane axis).  The source is
    streamed through VMEM in chunks; each output tile is revisited across
    the chunk sweep (chunk index innermost, so the out block stays
    resident) and rows are claimed with a disjoint-OR accumulate.  Read
    amplification is J = n_pad / tile (each chunk is re-fetched once per
    output tile), so this wins only if the vector gather is much faster
    than the per-row floor.
    **NEGATIVE on the current toolchain (round 4, measured):** the
    backend compiles a sublane ``dynamic_gather`` only when the source
    has <= 8 sublanes (one vreg tile); any larger extent crashes
    ``tpu_compile_helper`` (bisect: n=8 ok, n=16 crash; lane-axis gather
    compiles at any width).  Kept for interpret-mode tests and for future
    jaxlibs; `row_gather_dma` is the TPU-compilable candidate.
  * `row_gather_dma` — per-row async DMA from an HBM-resident source into
    the VMEM output tile, W-way pipelined.  This measures the raw DMA
    descriptor-issue rate; it beats XLA only if issue cost is well below
    the ~13 ns/row XLA pays.

Both implement the `permute_gather_rows` contract's u32 core
(core/buckets.py:473): out[r, p, :] = src[r % S, idx[r, p], :] with the
last axis padded to 128 lanes (one 512 B HBM row per point).  Reference
semantics being replaced: the per-round unsort of
/root/reference/src/models/attention/hept.py:112-115.

Measured on TPU v5e by scripts/probe_gather_pallas.py (queue35); the
winner (if any) slots in behind `permute_gather_rows` via
HEPT_ROW_GATHER=pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_inputs(src: jax.Array, idx: jax.Array, tile: int):
    """Pad n to a multiple of `tile` and lanes to 128.

    Pad rows of `idx` point at themselves (into the padded source range),
    so every index stays in-bounds and pad output rows are well-defined.
    """
    S, n, w = src.shape
    R = idx.shape[0]
    n_pad = _round_up(n, tile)
    if w > LANES:
        raise ValueError(f"row width {w} exceeds one lane group ({LANES})")
    if w < LANES or n_pad > n:
        src = jnp.pad(src, ((0, 0), (0, n_pad - n), (0, LANES - w)))
    if n_pad > n:
        tail = jnp.broadcast_to(
            jnp.arange(n, n_pad, dtype=idx.dtype)[None], (R, n_pad - n)
        )
        idx = jnp.concatenate([idx, tail], axis=1)
    return src, idx, n_pad


# ---------------------------------------------------------------------------
# Candidate 1: in-VMEM vector gather (tpu.dynamic_gather), chunk-swept.
# ---------------------------------------------------------------------------


def _vreg_kernel(idx_ref, src_ref, out_ref, *, tile: int):
    c = pl.program_id(2)
    local = idx_ref[0] - c * tile  # (tile, LANES) i32, pre-broadcast
    inb = (local >= 0) & (local < tile)
    clipped = jnp.clip(local, 0, tile - 1)
    # take_along_axis along sublanes (tpu.dynamic_gather): idx comes
    # pre-broadcast to the src block shape (the 8x128 block-layout rules
    # reject a 1-D (tile,) block, and an in-kernel lane->sublane
    # broadcast would be a transpose).
    g = jnp.take_along_axis(
        src_ref[0], clipped, axis=0, mode="promise_in_bounds"
    )
    claimed = jnp.where(inb, g, jnp.uint32(0))

    @pl.when(c == 0)
    def _init():
        out_ref[0] = claimed

    @pl.when(c != 0)
    def _accum():
        # Chunks partition the source rows, so claims are disjoint: OR.
        out_ref[0] = out_ref[0] | claimed


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def row_gather_vreg(
    src: jax.Array,
    idx: jax.Array,
    *,
    tile: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """out[r, p, :] = src[r % S, idx[r, p], :] via in-VMEM vector gathers.

    src: (S, n, w<=128) uint32; idx: (R, n) int32 with R % S == 0.
    Returns (R, n, 128) uint32 (caller slices lanes back to w).
    """
    S, n, _ = src.shape
    R = idx.shape[0]
    src, idx, n_pad = _pad_inputs(src, idx, tile)
    jc = n_pad // tile
    idxb = jnp.broadcast_to(idx[:, :, None], (R, n_pad, LANES))
    out = pl.pallas_call(
        functools.partial(_vreg_kernel, tile=tile),
        grid=(R, jc, jc),
        in_specs=[
            pl.BlockSpec((1, tile, LANES), lambda r, j, c: (r, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, LANES), lambda r, j, c: (r % S, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, LANES), lambda r, j, c: (r, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, n_pad, LANES), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(idxb, src)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Candidate 2: per-row pipelined DMA gather from an HBM-resident source.
# ---------------------------------------------------------------------------

_DMA_WINDOW = 16


def _dma_kernel(idx_ref, src_ref, out_ref, sem, *, t_tile: int, s_rounds: int):
    r = pl.program_id(0)
    rs = lax.rem(r, s_rounds)

    def issue(i):
        return pltpu.make_async_copy(
            src_ref.at[rs, idx_ref[0, 0, 0, i]], out_ref.at[0, i],
            sem.at[lax.rem(i, _DMA_WINDOW)],
        )

    def body(i, _):
        @pl.when(i >= _DMA_WINDOW)
        def _drain():
            # Same-shaped copy handle on the same slot: waits the right
            # byte count for the copy issued _DMA_WINDOW rows ago.
            issue(i - _DMA_WINDOW).wait()

        issue(i).start()
        return 0

    lax.fori_loop(0, t_tile, body, 0)

    def drain(i, _):
        issue(t_tile - _DMA_WINDOW + i).wait()
        return 0

    lax.fori_loop(0, min(_DMA_WINDOW, t_tile), drain, 0)


def _auto_interpret() -> bool:
    # Interpret everywhere but a real TPU backend (the axon tunnel
    # registers as its own platform name), so CPU tests/meshes just work.
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def row_gather_dma(
    src: jax.Array,
    idx: jax.Array,
    *,
    t_tile: int = 1024,
    interpret: bool | None = None,
) -> jax.Array:
    """out[r, p, :] = src[r % S, idx[r, p], :] via per-row pipelined DMA.

    src: (S, n, w<=128) uint32 (stays in HBM); idx: (R, n) int32.
    Returns (R, n, 128) uint32.
    """
    if interpret is None:
        interpret = _auto_interpret()
    S, n, _ = src.shape
    R = idx.shape[0]
    src, idx, n_pad = _pad_inputs(src, idx, t_tile)
    jc = n_pad // t_tile
    # (R, jc, 1, t_tile) so the SMEM block's last two dims equal the
    # array's (the 8x128 block-layout rules reject a (1, t_tile) block).
    idx4 = idx.reshape(R, jc, 1, t_tile)
    out = pl.pallas_call(
        functools.partial(_dma_kernel, t_tile=t_tile, s_rounds=S),
        grid=(R, jc),
        in_specs=[
            pl.BlockSpec((1, 1, 1, t_tile), lambda r, j: (r, j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, t_tile, LANES), lambda r, j: (r, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, n_pad, LANES), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_DMA_WINDOW,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(idx4, src)
    return out[:, :n]
