"""Multiresolution hash-grid encoder (instant-NGP style).

TPU-native replacement for the reference's CUDA grid encoder
(`mycuda/torch_ngp_grid_encoder/gridencoder.cu`, wrapped at
`mycuda/torch_ngp_grid_encoder/grid.py:106-172`). Defaults follow the
reference configs: online 4 levels 16->128 res, 2^22 table, 2 ch/level
(`config.yml:44-47`); global refine 16 levels -> 256/512.

Design notes (TPU-first):
  - The table is a stacked (L, T, C) array; the forward is one batched
    gather of 8 corners x L levels, the backward is the gather transpose
    (scatter-add), which XLA lowers natively on TPU. All shapes static.
  - Levels whose dense grid fits in the table use dense (collision-free)
    indexing; larger levels use the NGP spatial hash (same prime constants
    as the reference so ported weights stay valid).
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


def init_hashgrid_params(key, spec: HashGridSpec, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) init, as in torch-ngp."""
    shape = (spec.n_levels, spec.table_size, spec.level_dim)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


def _corner_indices(coords, res, table_size):
    """(N,3) int corner coords at a level -> (N,) table indices.
    Dense indexing when the level grid fits, else NGP spatial hash."""
    n_dense = (res + 1) ** 3
    stride = res + 1
    dense_idx = (coords[..., 0] * stride + coords[..., 1]) * stride + coords[..., 2]
    cu = coords.astype(jnp.uint32)
    h = ((cu[..., 0] * jnp.uint32(_PRIMES[0]))
         ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
         ^ (cu[..., 2] * jnp.uint32(_PRIMES[2])))
    hash_idx = (h & jnp.uint32(table_size - 1)).astype(jnp.int32)
    use_dense = n_dense <= table_size
    return jnp.where(use_dense, dense_idx % table_size, hash_idx)


# the 8 unit-cube corner offsets, fixed order
_CORNERS = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)], np.int32)


@functools.partial(jax.jit, static_argnames=("spec",))
def hashgrid_encode(table, x, spec: HashGridSpec):
    """Encode points with the multires hash grid.

    @table: (L, T, C) parameters.
    @x: (N, 3) points in [-1, 1].
    Returns (N, L*C) float32 features. Differentiable in both args (the
    table gradient lowers to an XLA scatter-add; the point gradient flows
    through the trilinear weights — needed for eikonal/normal losses).
    """
    L, T, C = table.shape
    x01 = jnp.clip((x.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)  # [0,1]
    res = jnp.asarray(spec.level_res(), jnp.int32)  # (L,)

    def level_fn(tab_l, res_l):
        xl = x01 * res_l.astype(jnp.float32)
        x0 = jnp.clip(jnp.floor(xl).astype(jnp.int32), 0, res_l - 1)  # (N,3)
        w = xl - x0.astype(jnp.float32)  # (N,3) in [0,1]
        feats = jnp.zeros((x.shape[0], C), jnp.float32)
        for c in range(8):
            off = jnp.asarray(_CORNERS[c])
            corner = x0 + off  # (N,3)
            idx = _corner_indices(corner, res_l, T)
            wc = jnp.prod(jnp.where(off.astype(bool), w, 1.0 - w), axis=-1)  # (N,)
            feats = feats + tab_l[idx].astype(jnp.float32) * wc[:, None]
        return feats

    out = jax.vmap(level_fn, in_axes=(0, 0), out_axes=1)(table, res)  # (N,L,C)
    return out.reshape(x.shape[0], L * C)


def hashgrid_encode_np(table, x, spec: HashGridSpec):
    """Pure-numpy golden reference for tests."""
    table = np.asarray(table, np.float64)
    x = np.asarray(x, np.float64)
    L, T, C = table.shape
    x01 = np.clip((x + 1.0) * 0.5, 0.0, 1.0)
    out = np.zeros((x.shape[0], L, C))
    for li, res in enumerate(spec.level_res()):
        xl = x01 * res
        x0 = np.clip(np.floor(xl).astype(np.int64), 0, res - 1)
        w = xl - x0
        n_dense = (res + 1) ** 3
        for c in range(8):
            off = _CORNERS[c]
            corner = x0 + off
            if n_dense <= T:
                stride = res + 1
                idx = (corner[:, 0] * stride + corner[:, 1]) * stride + corner[:, 2]
            else:
                idx = ((corner[:, 0] * _PRIMES[0])
                       ^ (corner[:, 1] * _PRIMES[1])
                       ^ (corner[:, 2] * _PRIMES[2])) & (T - 1)
            wc = np.prod(np.where(off.astype(bool), w, 1.0 - w), axis=-1)
            out[:, li] += table[li, idx] * wc[:, None]
    return out.reshape(x.shape[0], L * C)
