"""Multiresolution hash-grid encoder (instant-NGP style).

TPU-native replacement for the reference's CUDA grid encoder
(`mycuda/torch_ngp_grid_encoder/gridencoder.cu`, wrapped at
`mycuda/torch_ngp_grid_encoder/grid.py:106-172`). Defaults follow the
reference configs: online 4 levels 16->128 res, 2^22 table, 2 ch/level
(`config.yml:44-47`); global refine 16 levels -> 256/512.

Design notes (TPU-first; v5e measurements in docs/PERF.md):
  - The parameter is ONE flat (rows, C) array with exact per-level
    allocation: dense (collision-free) levels get exactly (res+1)^3 rows,
    oversized levels get 2^log2_hashmap_size hashed rows. The hash uses
    the same prime constants as the reference (same collision
    distribution), but the flat LAYOUT is intentionally different: the
    reference rounds each level's row count up to a multiple of 8
    (grid.py:130) and derives per-level resolution as ceil(2^(l*s)*H-1)+1
    with a +0.5 grid offset (gridencoder.cu:155-165), so raw reference
    embedding tables are NOT drop-in; checkpoints are native to this
    encoder. No padding to a uniform (L, T, C) block — that wasted 14x
    optimizer traffic and backward zero-fills at the online config.
  - XLA gather is ~12-22ns/row and scatter-add ~100ns/row on v5e
    REGARDLESS of row width, so row count is everything. Dense levels
    pack each voxel's 8 corner features into one 8C-wide row (8 cheap
    flat rolls — neighbor offsets are constant strides in lexicographic
    order), so a sample-level query is ONE row instead of 8.
  - Ray mode (`ray_mode=True`, points grouped as (n_rays, ray_samples)
    z-ordered along each ray): consecutive samples repeatedly land in the
    same voxel, massively so at coarse levels. The encoder gathers ONE
    packed row per (ray, voxel-run, level) — a per-level budget of
    `k_runs` runs — and broadcasts runs back to samples with a one-hot
    einsum that the MXU eats. Autodiff of this path scatters one row per
    run instead of one per sample, and every other adjoint is a matmul.
    Runs beyond the budget clamp to the last run (wrong features for the
    overflow tail). Measured on the online workload (S=192): finest-level
    runs/ray mean 20 / p99 167 / max 178, so the default min(S, res)=128
    budget clamps ~1% of rays' deep tails; `k_runs` is the quality/cost
    dial. At the trained model the aggregate effect is ~1e-6 rel err vs
    plain autodiff (docs/PERF.md).
  - Interpolation runs in float32; the table may be bfloat16 or float32.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# NGP spatial hash primes (must match gridencoder.cu for weight ports).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridSpec:
    n_levels: int = 4
    level_dim: int = 2
    base_res: int = 16
    finest_res: int = 128
    log2_hashmap_size: int = 22
    # ray mode geometry: samples per ray (S). Only used by calls with
    # ray_mode=True; see module docstring.
    ray_samples: int = 0
    # optional per-dense-level run budgets; () -> min(S, res) default
    k_runs: tuple = ()
    # table-gradient scatter engine (ops/scatter.py): "auto" picks the
    # dense one-hot MXU engine for small levels and the sorted-tile Pallas
    # engine for big ones; "xla" forces the plain scatter (slow baseline).
    scatter_method: str = "auto"
    # static cap on kept (valid) rows in the sorted-tile engine, as a
    # fraction of the run-budget row count; overflow falls back to the
    # exact plain scatter inside a lax.cond.
    scatter_m_cap_frac: float = 0.5
    # bf16 matmul compute in the scatter engines (f32 accumulate); the
    # reference accumulates this gradient in fp16 atomics, so this is
    # more faithful than that. False -> exact f32 (slower, for tests).
    scatter_bf16: bool = True
    # bf16 packed corner tables: halves pack/gather/scatter bandwidth on
    # the dense levels (table params and Adam state stay f32). The
    # reference stores its whole table in fp16 (torch-ngp half path), so
    # bf16 features are more faithful than that. False -> exact f32.
    table_bf16: bool = False
    # two-tier ray-sorted run budgets (dense levels with K >= 32): rays
    # are sorted by run count; the top tier_frac get budget min(S, 2K)
    # (strictly more exact than K), the rest K//4. Run counts concentrate
    # hard (online finest level: mean 20, p95 50 at K=128), so ~45% of
    # the row-count-bound gather/scatter rows were sentinel waste. Guarded
    # by a lax.cond: when more than tier_frac*R rays exceed K//4 runs the
    # level falls back to the exact single-budget path. 0 -> off.
    tier_frac: float = 0.25

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.level_dim

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(np.exp((np.log(self.finest_res) - np.log(self.base_res))
                            / (self.n_levels - 1)))

    def level_res(self) -> np.ndarray:
        b = self.per_level_scale
        return np.floor(self.base_res * b ** np.arange(self.n_levels)).astype(np.int64)

    def layout(self):
        """Per-level (res, is_dense, n_rows, offset) into the flat table."""
        out = []
        off = 0
        for r in self.level_res():
            r = int(r)
            dense = (r + 1) ** 3 <= self.table_size
            n_rows = (r + 1) ** 3 if dense else self.table_size
            out.append((r, dense, n_rows, off))
            off += n_rows
        return out

    @property
    def total_rows(self) -> int:
        return sum(n for _, _, n, _ in self.layout())

    def run_budget(self, level: int) -> int:
        """Per-ray voxel-run budget for a dense level, rounded up to 8."""
        if self.k_runs:
            k = self.k_runs[level]
        else:
            res = int(self.level_res()[level])
            k = min(self.ray_samples, max(8, res))
        return -(-int(k) // 8) * 8


def init_hashgrid_params(key, spec: HashGridSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) init, as in torch-ngp. Shape (total_rows, C)."""
    shape = (spec.total_rows, spec.level_dim)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


# the 8 unit-cube corner offsets, fixed order
_CORNERS = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)], np.int32)


def _pack_dense_level(table, t_off: int, n_rows: int, res: int,
                      bf16: bool = False):
    """Packed corner table for one dense level.

    In a dense (res+1)^3 block, neighbor corner c lives at a constant flat
    offset (cx*S*S + cy*S + cz), so 8 rolls + concat give an (n_rows, 8C)
    table whose row i holds all 8 corner features of voxel base i.

    @bf16: pack (and hence gather) in bfloat16 — halves pack/gather/
    scatter bandwidth. The cotangent accumulates the 8 corner paths in
    bf16; the reference accumulates its table gradient in fp16 atomics
    over far more terms (gridencoder.cu:250+), so this stays more
    faithful than the system being matched.
    """
    S = res + 1
    block = jax.lax.slice_in_dim(table, t_off, t_off + n_rows, axis=0)
    if bf16:
        block = block.astype(jnp.bfloat16)
    shifts = [(int(c[0]) * S * S + int(c[1]) * S + int(c[2]))
              for c in _CORNERS]
    return jnp.concatenate(
        [jnp.roll(block, -s, axis=0) for s in shifts], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _packed_gather(packed, rows, n_rows: int, method: str, m_cap: int,
                   t_tile: int, win: int, bf16: bool = True):
    """Gather packed rows; sentinel rows (== n_rows) return zeros.

    The backward routes the table gradient through ops/scatter.py instead
    of XLA's row-serialized scatter-add (~100ns/row on v5e).
    """
    r = jnp.minimum(rows, n_rows - 1)
    return packed[r] * (rows < n_rows).astype(packed.dtype)[:, None]


def _packed_gather_fwd(packed, rows, n_rows, method, m_cap, t_tile, win,
                       bf16=True):
    # zero-size slice rides along purely to carry packed's dtype into bwd
    return (_packed_gather(packed, rows, n_rows, method, m_cap, t_tile, win,
                           bf16),
            (rows, jax.lax.slice_in_dim(packed, 0, 0, axis=0)))


def _packed_gather_bwd(n_rows, method, m_cap, t_tile, win, bf16, res, g):
    from bundlesdf_tpu.ops.scatter import scatter_rows

    rows, proto = res
    d_packed = scatter_rows(g, rows, n_rows, method=method, m_cap=m_cap,
                            t_tile=t_tile, win=win, bf16=bf16,
                            out_bf16=proto.dtype == jnp.bfloat16)
    d_rows = np.zeros(rows.shape, dtype=jax.dtypes.float0)
    return d_packed.astype(proto.dtype), d_rows


_packed_gather.defvjp(_packed_gather_fwd, _packed_gather_bwd)


def _run_starts(ids):
    """(R,S) int ids -> (R,S) bool, True where a new voxel run starts."""
    R = ids.shape[0]
    return jnp.concatenate(
        [jnp.ones((R, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=1)


def _select_ids_einsum(st, ids, n_rows: int):
    """Select one id per (r, k) slot via MXU one-hot einsum: @st (R,S,K)
    bool with at most one True per (r, k); @ids (R,S) int32. The einsum is
    a pure selection (one nonzero product per output), so it is exact iff
    each id VALUE is exact in f32. Small levels (< 2^24 rows) use one
    einsum; bigger dense levels (e.g. res 256 at T=2^25: 257^3 = 16.97M
    rows) split each id into 12-bit halves (< 4096, exact) and recombine
    in int32. Slots with no True row return 0."""
    stf = st.astype(jnp.float32)
    if n_rows < (1 << 24):
        out = jnp.einsum("rsk,rs->rk", stf, ids.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.int32)
    assert n_rows < (1 << 31)
    hi = jnp.einsum("rsk,rs->rk", stf, (ids >> 12).astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    lo = jnp.einsum("rsk,rs->rk", stf, (ids & 0xFFF).astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    return (hi.astype(jnp.int32) << 12) | lo.astype(jnp.int32)


def _dedup_level_features(packed, ids, K: int, W: int, n_rows: int,
                          method: str, m_cap_frac: float, bf16: bool):
    """Gather one packed row per voxel run and broadcast back to samples.

    @packed: (n_rows, W) packed corner table of ONE dense level; @ids:
    (R, S) level-local row ids, z-ordered along each ray; @K: static run
    budget. Returns (R, S, W) per-sample packed features.

    The gather issues R*K rows (vs R*S*8 naive); its custom-VJP transpose
    is an R*K-row smart scatter (ops/scatter.py). The run->sample
    broadcast is a one-hot einsum so BOTH its forward and its transpose
    are MXU matmuls (take_along_axis here would transpose to a per-ray
    scatter — two orders slower).
    """
    R, S = ids.shape
    is_start = _run_starts(ids)
    run_ord = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1  # (R,S)
    run_id = jnp.minimum(run_ord, K - 1)
    k_ids = jnp.arange(K, dtype=jnp.int32)

    # run k's row id, extracted with a one-hot einsum instead of
    # top_k + take_along_axis (row-serialized on TPU). Exactly one start
    # per k (< K) matches (run_ord unclamped excludes overflow runs), so
    # the einsum is a pure selection: exact iff each id VALUE is exact in
    # f32. Small levels (< 2^24 rows) use one einsum; bigger dense levels
    # (e.g. res 256 at T=2^25: 257^3 = 16.97M rows) split each id into
    # 12-bit halves (< 4096, exact) and recombine in int32.
    st = ((run_ord[..., None] == k_ids) & is_start[..., None])    # (R,S,K)
    rows_k = _select_ids_einsum(st, ids, n_rows)                  # (R,K)
    n_runs = jnp.sum(is_start.astype(jnp.int32), axis=1)          # (R,)
    valid_k = k_ids[None, :] < n_runs[:, None]
    # sentinel n_rows: empty slots gather zeros and sort out of the
    # scatter in the backward (they would otherwise pile onto row 0)
    rows_k = jnp.where(valid_k, rows_k, n_rows)

    m_cap = -(-int(R * K * m_cap_frac) // 512) * 512
    got = _packed_gather(packed, rows_k.reshape(-1), n_rows, method,
                         m_cap, 1024, 512, bf16).reshape(R, K, W)

    def broadcast(got, run_id):
        onehot = (run_id[..., None] == jnp.arange(K, dtype=jnp.int32)
                  ).astype(got.dtype)                             # (R,S,K)
        return jnp.einsum("rsk,rkw->rsw", onehot, got,
                          preferred_element_type=jnp.float32)

    # the (R,S,K) one-hot is pure index math — recompute it in the
    # backward instead of storing hundreds of MB of residuals
    return jax.checkpoint(broadcast)(got, run_id)


@jax.custom_vjp
def _permute_rows(x, perm, inv):
    """Differentiable row permutation whose VJP is a GATHER by the inverse
    permutation (the naive `x[perm]` adjoint is an XLA scatter, ~100ns/row
    on v5e vs ~12-21ns/row for the gather). @perm/@inv are int32 inverse
    permutation pairs (non-differentiable)."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv):
    return x[perm], (perm, inv)


def _permute_rows_bwd(res, g):
    perm, inv = res
    return (g[inv],
            np.zeros(perm.shape, jax.dtypes.float0),
            np.zeros(inv.shape, jax.dtypes.float0))


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _dedup_two_tier(packed, ids, K: int, W: int, n_rows: int, X: int,
                    method: str, m_cap_frac: float, bf16: bool):
    """Two-tier run-budget dedup: sort rays by voxel-run count, give the
    top X rays budget K_hi = min(S, 2K) (a superset of the single-budget
    K — strictly less clamping) and the rest K_lo = K//4. Whenever any
    rest-tier ray has more than K_lo runs the whole level falls back to
    the single-budget path (same output as before), so two-tier output is
    never LESS exact than the K-budget baseline. Ray permutation costs
    only R gather rows (row-count-bound, R ~ 2k) while the slot gather
    and its scatter transpose shrink ~2x at the online workload."""
    R, S = ids.shape
    K_lo = max(8, (K // 4 // 8) * 8)
    K_hi = min(S, 2 * K)
    n_runs = jnp.sum(_run_starts(ids).astype(jnp.int32), axis=1)    # (R,)
    iota = jnp.arange(R, dtype=jnp.int32)
    neg_sorted, perm = jax.lax.sort((-n_runs, iota), num_keys=1)
    _, inv = jax.lax.sort((perm, iota), num_keys=1)
    ok = -neg_sorted[X] <= K_lo

    def tiered(_):
        ids_s = ids[perm]
        f_hi = _dedup_level_features(packed, ids_s[:X], K_hi, W, n_rows,
                                     method, m_cap_frac, bf16)
        f_lo = _dedup_level_features(packed, ids_s[X:], K_lo, W, n_rows,
                                     method, m_cap_frac, bf16)
        return _permute_rows(jnp.concatenate([f_hi, f_lo], axis=0),
                             inv, perm)

    def single(_):
        return _dedup_level_features(packed, ids, K, W, n_rows, method,
                                     m_cap_frac, bf16)

    return jax.lax.cond(ok, tiered, single, None)


@functools.partial(jax.jit, static_argnames=("spec", "ray_mode"))
def hashgrid_encode(table, x, spec: HashGridSpec, ray_mode: bool = False):
    """Encode points with the multires hash grid.

    @table: (total_rows, C) flat parameters (see HashGridSpec.layout).
    @x: (N, 3) points in [-1, 1].
    @ray_mode: True iff x is (n_rays * spec.ray_samples, 3) with samples
      z-ordered along each ray — enables the run-dedup fast path. Mesh /
      arbitrary-point queries MUST pass False (the default): the run
      budget assumes ray coherence and silently truncates without it.

    Returns (N, L*C) float32 features. Differentiable in both args; the
    point gradient flows through the trilinear weights (needed for
    eikonal/normal losses).
    """
    D, C = table.shape
    N = x.shape[0]
    layout = spec.layout()
    x01 = jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)  # [0,1]
    res_np = np.array([r for r, _, _, _ in layout], np.int64)

    res = jnp.asarray(res_np, jnp.int32)[None, :, None]    # (1,L,1)
    xl = x01[:, None, :] * res.astype(jnp.float32)         # (N,L,3)
    x0 = jnp.clip(jnp.floor(xl).astype(jnp.int32), 0, res - 1)
    w = xl - x0.astype(jnp.float32)                        # (N,L,3)
    corners = jnp.asarray(_CORNERS)                        # (8,3)
    cb = corners.astype(bool)[None, None]                  # (1,1,8,3)
    wc = jnp.prod(jnp.where(cb, w[:, :, None, :], 1.0 - w[:, :, None, :]),
                  axis=-1)                                 # (N,L,8)

    L = spec.n_levels
    # resolutions grow with level, so dense levels always precede hashed
    # ones — per-level outputs concatenate in level order
    dense_ids = [l for l in range(L) if layout[l][1]]
    hash_ids = [l for l in range(L) if not layout[l][1]]
    assert dense_ids + hash_ids == list(range(L))
    outs = []

    # ---- dense levels: packed-corner single-row gather ------------------
    if dense_ids:
        W = 8 * C
        S_ray = spec.ray_samples
        use_ray = ray_mode and S_ray > 0 and N % S_ray == 0
        for l in dense_ids:
            res, _, n_rows, t_off = layout[l]
            S = res + 1
            packed = _pack_dense_level(table, t_off, n_rows, res,
                                       bf16=spec.table_bf16)
            b = x0[:, l, :]
            ids = (b[:, 0] * S + b[:, 1]) * S + b[:, 2]    # (N,) local
            if use_ray:
                R = N // S_ray
                K = min(spec.run_budget(l), S_ray)
                X = (int(R * spec.tier_frac) // 8) * 8
                if spec.tier_frac > 0 and K >= 32 and X >= 8 and R - X >= 8:
                    f = _dedup_two_tier(
                        packed, ids.reshape(R, S_ray), K, W, n_rows, X,
                        spec.scatter_method, spec.scatter_m_cap_frac,
                        spec.scatter_bf16).reshape(N, 8, C)
                else:
                    f = _dedup_level_features(
                        packed, ids.reshape(R, S_ray), K, W, n_rows,
                        spec.scatter_method, spec.scatter_m_cap_frac,
                        spec.scatter_bf16).reshape(N, 8, C)
            else:
                f = packed[ids].reshape(N, 8, C)
            outs.append(jnp.sum(f.astype(jnp.float32)
                                * wc[:, l, :, None], axis=1))   # (N,C)

    # ---- oversized levels: spatial hash, one flat 8-corner gather --------
    # The gather rides the same custom-VJP as the dense path so the table
    # gradient goes through the sorted-tiles scatter engine instead of
    # XLA's ~100ns/row scatter — at the 16-level global-refine config the
    # hash levels are 15.7M scatter rows/step (the dominant refine cost).
    if hash_ids:
        T = spec.table_size
        corner = x0[:, hash_ids][:, :, None, :] + corners[None, None]
        cu = corner.astype(jnp.uint32)
        h = ((cu[..., 0] * jnp.uint32(_PRIMES[0]))
             ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
             ^ (cu[..., 2] * jnp.uint32(_PRIMES[2])))
        idx = (h & jnp.uint32(T - 1)).astype(jnp.int32)      # (N,Lh,8)
        level_off = jnp.asarray([layout[l][3] for l in hash_ids],
                                jnp.int32)[None, :, None]
        flat_idx = (idx + level_off).reshape(-1)
        hash_rows = sum(layout[l][2] for l in hash_ids)
        hash_off = layout[hash_ids[0]][3]
        block = jax.lax.slice_in_dim(table, hash_off, hash_off + hash_rows,
                                     axis=0)
        if spec.table_bf16:
            block = block.astype(jnp.bfloat16)
        gv = _packed_gather(block, flat_idx - hash_off, hash_rows,
                            spec.scatter_method, 0, 1024, 512,
                            spec.scatter_bf16)
        gv = gv.reshape(N, len(hash_ids), 8, C).astype(jnp.float32)
        wch = wc[:, jnp.asarray(hash_ids)]                   # (N,Lh,8)
        hv = jnp.sum(gv * wch[..., None], axis=2)            # (N,Lh,C)
        outs.extend(hv[:, k] for k in range(len(hash_ids)))

    return jnp.concatenate(outs, axis=-1)                    # (N, L*C)


@functools.partial(jax.jit, static_argnames=("spec",))
def run_overflow_fractions(x, spec: HashGridSpec):
    """Per-dense-level fraction of rays whose voxel-run count exceeds the
    k_runs budget (telemetry for the silent quality dial: runs >= K reuse
    run K-1's features — exactness guarantee mirrored from
    mycuda/common.cu:66-93's printf-and-hang consistency check).

    @x: (R * spec.ray_samples, 3) z-ordered ray samples in [-1, 1].
    Returns (n_dense_levels,) float32 overflow fractions (level order).
    """
    layout = spec.layout()
    S_ray = spec.ray_samples
    assert S_ray > 0 and x.shape[0] % S_ray == 0
    R = x.shape[0] // S_ray
    x01 = jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)
    fracs = []
    for l, (res, dense, _, _) in enumerate(layout):
        if not dense:
            continue
        xl = x01 * res
        x0 = jnp.clip(jnp.floor(xl).astype(jnp.int32), 0, res - 1)
        S = res + 1
        ids = ((x0[:, 0] * S + x0[:, 1]) * S + x0[:, 2]).reshape(R, S_ray)
        n_runs = jnp.sum(_run_starts(ids).astype(jnp.int32), axis=1)
        K = min(spec.run_budget(l), S_ray)
        fracs.append(jnp.mean((n_runs > K).astype(jnp.float32)))
    if not fracs:
        return jnp.zeros((0,), jnp.float32)
    return jnp.stack(fracs)


def hashgrid_encode_np(table, x, spec: HashGridSpec):
    """Pure-numpy golden reference for tests (flat table layout)."""
    table = np.asarray(table, np.float64)
    x = np.asarray(x, np.float64)
    C = table.shape[-1]
    x01 = np.clip((x + 1.0) * 0.5, 0.0, 1.0)
    L = spec.n_levels
    out = np.zeros((x.shape[0], L, C))
    for li, (res, dense, n_rows, off) in enumerate(spec.layout()):
        xl = x01 * res
        x0 = np.clip(np.floor(xl).astype(np.int64), 0, res - 1)
        w = xl - x0
        block = table[off:off + n_rows]
        for c in range(8):
            coff = _CORNERS[c]
            corner = x0 + coff
            if dense:
                stride = res + 1
                idx = (corner[:, 0] * stride + corner[:, 1]) * stride + corner[:, 2]
            else:
                idx = ((corner[:, 0] * _PRIMES[0])
                       ^ (corner[:, 1] * _PRIMES[1])
                       ^ (corner[:, 2] * _PRIMES[2])) & (spec.table_size - 1)
            wc = np.prod(np.where(coff.astype(bool), w, 1.0 - w), axis=-1)
            out[:, li] += block[idx] * wc[:, None]
    return out.reshape(x.shape[0], L * C)
