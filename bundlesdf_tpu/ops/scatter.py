"""Row scatter-add engines for the hash-grid backward.

XLA's native scatter-add on TPU is row-serialized (~100ns/row on v5e
regardless of width) — at the online NOF workload it was 55ms of a 119ms
step. These engines rebuild the scatter out of dense MXU/VPU work:

  - `scatter_rows_dense_onehot`: out = onehot(rows)^T @ vals. For SMALL
    tables (coarse hash-grid levels) the full one-hot fits comfortably and
    the MXU does the whole scatter in ~1.5ms regardless of row count.
  - `scatter_rows_sorted_tiles`: sort rows, drop invalid (sentinel) rows
    by static truncation, then a Pallas kernel processes a compacted list
    of (table-tile, window) work items; each item DMAs the (contiguous!)
    window of sorted values that lands in its tile and places them with a
    small one-hot matmul. All per-row work becomes block DMA + MXU.
    Exactness is preserved by a lax.cond fallback to the plain XLA
    scatter whenever a static cap would overflow.

Matmul compute runs in bfloat16 with float32 accumulation by default
(`bf16=True`) — the reference CUDA grid encoder accumulates its table
gradient in fp16 atomics (`gridencoder.cu:250+`, half2 path), so bf16
(same exponent range as f32) is strictly more faithful than that.

Row convention: `rows` may contain the sentinel value `n_rows` (== table
row count) meaning "drop this row". Valid ids are in [0, n_rows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scatter_rows_xla(vals, rows, n_rows: int):
    """Plain XLA scatter-add baseline (sentinel rows dropped)."""
    return jnp.zeros((n_rows, vals.shape[-1]), vals.dtype).at[rows].add(
        vals, mode="drop")


def scatter_rows_dense_onehot(vals, rows, n_rows: int, bf16: bool = True):
    """out[t] = sum_m [rows[m] == t] * vals[m] as one MXU matmul.

    Cost is O(M * n_rows) compare + matmul — only sane for small tables
    (coarse dense levels, n_rows <= ~64k). Sentinel rows never match.
    """
    dt = jnp.bfloat16 if bf16 else vals.dtype
    t_ids = jnp.arange(n_rows, dtype=jnp.int32)[None, :]
    onehot = (rows[:, None] == t_ids).astype(dt)  # (M, n_rows)
    return jax.lax.dot_general(onehot, vals.astype(dt),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sorted_tiles_kernel(t_tile: int, win: int):
    # NOTE: compute stays f32 — a bf16 one-hot dot inside this
    # scalar-prefetch kernel trips a Mosaic "Bad lhs type" compile error
    # in this environment (the same dot compiles standalone); the bf16
    # flag therefore only affects the dense one-hot engine.
    def kernel(wtile_ref, ps_ref, pe_ref, srows_a, srows_b, svals_a,
               svals_b, out_ref):
        w = pl.program_id(0)
        tile = wtile_ref[w]
        ps = ps_ref[w]
        pe = pe_ref[w]
        prev = wtile_ref[jnp.maximum(w - 1, 0)]
        first = (w == 0) | (prev != tile)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(ps < pe)
        def _():
            base = (ps // win) * win
            rows = jnp.concatenate([srows_a[:], srows_b[:]], axis=1)  # (1,2W)
            vals = jnp.concatenate([svals_a[:], svals_b[:]], axis=0)  # (2W,C)
            j = base + jax.lax.broadcasted_iota(jnp.int32, (1, 2 * win), 1)
            valid = (j >= ps) & (j < pe)
            local = rows - tile * t_tile
            t_ids = jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
            # transposed one-hot so the matmul contracts on the last lhs
            # dim (Mosaic rejects dim-0 contraction for bf16 operands)
            onehot = ((local == t_ids) & valid).astype(vals.dtype)  # (T,2W)
            out_ref[:] = out_ref[:] + jax.lax.dot_general(
                onehot, vals, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_rows", "m_cap", "t_tile", "win",
                                    "bf16"))
def scatter_rows_sorted_tiles(vals, rows, n_rows: int, m_cap: int = 0,
                              t_tile: int = 1024, win: int = 512,
                              bf16: bool = True):
    """Sorted-window tile scatter-add (see module docstring).

    @vals: (M, C) float32; @rows: (M,) int32 in [0, n_rows] (n_rows =
    sentinel/drop). @m_cap: static cap on the number of VALID rows kept
    after sorting (0 -> M).

    Work-item compaction: every table tile gets one work item (it must at
    least zero its output block); tiles receiving more than `win` rows get
    ceil(count/win) items. The static work budget is n_tiles + m_cap/win
    (each extra item implies win kept rows, so this cannot overflow).
    Falls back to the plain XLA scatter via lax.cond when more than m_cap
    rows are valid — the result is exact either way.
    """
    M, C = vals.shape
    if m_cap <= 0 or m_cap > M:
        m_cap = M
    m_cap = -(-m_cap // win) * win
    m_cap = min(m_cap, -(-M // win) * win)
    n_tiles = -(-n_rows // t_tile)
    d_pad = n_tiles * t_tile

    # one sort yields both the sorted keys and the permutation (argsort +
    # rows[order] would re-gather 262k rows the sort already produced)
    iota = jnp.arange(M, dtype=jnp.int32)
    srows_full, order = jax.lax.sort((rows, iota), num_keys=1)
    n_valid = jnp.sum((rows < n_rows).astype(jnp.int32))
    overflow = n_valid > m_cap

    srows = jax.lax.slice_in_dim(srows_full, 0, m_cap)
    svals = vals[jax.lax.slice_in_dim(order, 0, m_cap)]
    # mask rows past the valid count (sentinel tail inside the cap)
    pos = jnp.arange(m_cap, dtype=jnp.int32)
    srows = jnp.where(pos < n_valid, srows, d_pad)  # park off every tile

    # per-tile boundaries over the sorted (valid-only) rows
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * t_tile
    starts = jnp.sum(srows[None, :] < bounds[:, None], axis=1).astype(jnp.int32)
    counts = starts[1:] - starts[:-1]

    # compacted work list: tile i gets max(1, ceil(count_i/win)) items
    items_per_tile = jnp.maximum(1, -(-counts // win))
    work_cap = n_tiles + m_cap // win
    first_item = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(items_per_tile)])  # (T+1,)
    w_ids = jnp.arange(work_cap, dtype=jnp.int32)
    # tile of work item w: count of first_item[1:] <= w
    work_tile = jnp.sum(first_item[None, 1:] <= w_ids[:, None],
                        axis=1).astype(jnp.int32)
    work_tile = jnp.minimum(work_tile, n_tiles - 1)
    p_of_w = w_ids - first_item[work_tile]
    ps = starts[work_tile] + p_of_w * win
    pe = jnp.minimum(starts[work_tile + 1], ps + win)
    # park out-of-range items (w >= total work): ps >= pe disables them
    total_work = first_item[n_tiles]
    ps = jnp.where(w_ids < total_work, ps, 0)
    pe = jnp.where(w_ids < total_work, pe, 0)
    ps = jnp.clip(ps, 0, m_cap)
    pe = jnp.clip(pe, 0, m_cap)

    # pad so window block b+1 is always in range
    pad = 2 * win
    srows_p = jnp.concatenate(
        [srows, jnp.full((pad,), d_pad, jnp.int32)])[None, :]  # (1, m+2W)
    svals_p = jnp.concatenate([svals, jnp.zeros((pad, C), svals.dtype)])

    kernel = _sorted_tiles_kernel(t_tile, win)

    def fast(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(work_cap,),
            in_specs=[
                pl.BlockSpec((1, win), lambda w, wt, ps, pe: (0, ps[w] // win),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win),
                             lambda w, wt, ps, pe: (0, ps[w] // win + 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((win, C), lambda w, wt, ps, pe: (ps[w] // win, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((win, C),
                             lambda w, wt, ps, pe: (ps[w] // win + 1, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_tile, C),
                                   lambda w, wt, ps, pe: (wt[w], 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_rows, C), jnp.float32),
            # Mosaic is TPU-only; CPU test runs use the interpreter
            interpret=jax.devices()[0].platform != "tpu",
        )(work_tile, ps, pe, srows_p, srows_p, svals_p, svals_p)

    def slow(_):
        return scatter_rows_xla(vals, rows, n_rows)

    return jax.lax.cond(overflow, slow, fast, None)


# table-size threshold below which the dense one-hot engine wins
DENSE_ONEHOT_MAX_ROWS = 65536


def scatter_rows(vals, rows, n_rows: int, method: str = "auto",
                 m_cap: int = 0, t_tile: int = 1024, win: int = 512,
                 bf16: bool = True):
    """Dispatch a row scatter-add. method: auto | xla | onehot | tiles."""
    if method == "xla":
        return scatter_rows_xla(vals, rows, n_rows)
    if method == "onehot" or (method == "auto"
                              and n_rows <= DENSE_ONEHOT_MAX_ROWS):
        return scatter_rows_dense_onehot(vals, rows, n_rows, bf16=bf16)
    return scatter_rows_sorted_tiles(vals, rows, n_rows, m_cap=m_cap,
                                     t_tile=t_tile, win=win, bf16=bf16)
