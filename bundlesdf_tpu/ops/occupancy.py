"""Dense occupancy grid over [-1,1]^3 — TPU replacement for the kaolin SPC
octree (`Utils.py:359-475` OctreeManager) and its CUDA ray-trace postprocess
(`mycuda/common.cu:128-167`).

Rationale: the reference's octree exists to (a) restrict NOF samples to
near-surface voxels and (b) cull rays/queries. At the sizes involved
(voxel 0.02 in a [-1,1] cube after normalization -> <= 128^3 bits) a dense
bitgrid + fixed-step DDA is strictly better on TPU: static shapes, no
ragged hits, one vectorized pass.

Ray tracing returns per-ray per-step occupancy over a static step count,
plus (near, far). Segment-style (z_in, z_out) access is derived from the
step mask by run-length encoding with cumsum (see sampling.py).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class OccupancyGrid:
    grid: jnp.ndarray        # (res,res,res) bool — the sampling grid
    res: int                 # static
    # trace grid: `grid` dilated one extra voxel, optionally at a COARSER
    # resolution (trace_res = res // trace_factor, cell = OR of the fine
    # block). The DDA marcher samples step MIDPOINTS; with step dt and a
    # point of an occupied voxel V on the ray, some midpoint lies within
    # dt/2 of it, i.e. within ceil(dt/2/trace_voxel) trace cells of V.
    # With dt <= 2*trace_voxel (n_steps >= trace_res covers the worst
    # 2*sqrt(3) box crossing) one extra dilation cell guarantees that
    # midpoint is marked occupied — no occupied voxel on a ray is ever
    # skipped (the reference's exact octree intersection property,
    # Utils.py:443-475), at the cost of segments conservatively wider by
    # <= 1 trace cell (the reference dilates its octree too). The coarse
    # trace halves the DDA's gather rows (row-count bound on TPU,
    # docs/PERF.md) at the price of slightly wider sample support.
    trace: jnp.ndarray | None = None
    trace_res: int | None = None   # static; None -> res

    def tree_flatten(self):
        return (self.grid, self.trace), (self.res, self.trace_res)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], children[1],
                   aux[1] if len(aux) > 1 else None)

    @property
    def voxel_size(self) -> float:
        return 2.0 / self.res


def build_occupancy_grid(pts, res: int, dilate_radius: int = 1,
                         trace_factor: int = 2) -> OccupancyGrid:
    """Voxelize normalized points into a (res,res,res) bool grid and dilate
    by `dilate_radius` voxels with a 27-neighborhood, matching the reference
    dilation loop (`nerf_runner.py:449-464`). Also builds the +1-dilated
    trace grid at res // trace_factor (see OccupancyGrid.trace; factor 1
    recovers the round-2 full-res trace).

    @pts: (N,3) in [-1,1] (numpy or jnp).
    """
    from scipy import ndimage

    pts = np.asarray(pts)
    coords = np.floor((pts + 1.0) / (2.0 / res)).astype(np.int64)
    coords = np.clip(coords, 0, res - 1)
    grid = np.zeros((res, res, res), bool)
    grid[coords[:, 0], coords[:, 1], coords[:, 2]] = True
    st = np.ones((3, 3, 3), bool)
    if dilate_radius > 0:
        grid = ndimage.binary_dilation(grid, iterations=dilate_radius,
                                       structure=st)
    f = max(1, int(trace_factor))
    while res % f:
        f -= 1
    tr = res // f
    coarse = grid.reshape(tr, f, tr, f, tr, f).any(axis=(1, 3, 5))
    trace = ndimage.binary_dilation(coarse, structure=st)
    # the trace grid is stored uint8: the DDA gathers one cell per
    # (ray, step) and 1-bit packed layouts pay a per-row decode that
    # bytes don't
    return OccupancyGrid(grid=jnp.asarray(grid), res=res,
                         trace=jnp.asarray(trace, dtype=jnp.uint8),
                         trace_res=tr)


@functools.partial(jax.jit, static_argnames=("use_trace",))
def query_occupancy(grid: OccupancyGrid, pts, use_trace: bool = False):
    """True where a normalized point lies in an occupied voxel
    (replaces OctreeManager.get_center_ids>=0, Utils.py:392-395).
    @use_trace: query the +1-dilated trace grid instead."""
    if use_trace and grid.trace is not None:
        g = grid.trace
        res = grid.trace_res or grid.res
    else:
        g = grid.grid
        res = grid.res
    coords = jnp.floor((pts + 1.0) * (res / 2.0)).astype(jnp.int32)
    inside = jnp.all((coords >= 0) & (coords < res), axis=-1)
    coords = jnp.clip(coords, 0, res - 1)
    occ = g[coords[..., 0], coords[..., 1], coords[..., 2]]
    if occ.dtype != jnp.bool_:
        occ = occ != 0
    return occ & inside


@functools.partial(jax.jit, static_argnames=("n_steps",))
def ray_trace_occupancy(grid: OccupancyGrid, rays_o, rays_d, n_steps: int = 256):
    """March unit-direction rays through the grid with fixed steps.

    Replaces kaolin `unbatched_raytrace` + `postprocessOctreeRayTracing`
    (Utils.py:443-475): instead of ragged (enter,exit) voxel hits we return
    a static (N, n_steps) occupancy mask over uniform steps spanning each
    ray's [-1,1]-box intersection, plus per-step t ranges.

    Returns dict with:
      t0, t1      — (N, n_steps) step interval bounds (ray-parameter t)
      occ         — (N, n_steps) bool, step midpoint in an occupied voxel
      near, far   — (N,) first/last occupied t (0 where no hit)
      hit         — (N,) bool
    """
    N = rays_o.shape[0]
    # ray/[-1,1]^3 intersection
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-12, 1e-12, rays_d)
    ta = (-1.0 - rays_o) * inv
    tb = (1.0 - rays_o) * inv
    tmin = jnp.max(jnp.minimum(ta, tb), axis=-1)
    tmax = jnp.min(jnp.maximum(ta, tb), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    box_hit = tmax > tmin

    dt = (tmax - tmin) / n_steps  # (N,)
    steps = jnp.arange(n_steps, dtype=jnp.float32)
    t0 = tmin[:, None] + steps[None, :] * dt[:, None]
    t1 = t0 + dt[:, None]
    tm = 0.5 * (t0 + t1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * tm[..., None]  # (N,S,3)
    # query the +1-dilated trace grid: midpoint stepping at dt <= 2*voxel
    # then provably never skips an occupied voxel (see OccupancyGrid.trace)
    occ = query_occupancy(grid, pts.reshape(-1, 3),
                          use_trace=True).reshape(N, n_steps)
    occ = occ & box_hit[:, None]

    any_occ = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)
    last = n_steps - 1 - jnp.argmax(occ[:, ::-1], axis=-1)
    near = jnp.where(any_occ, jnp.take_along_axis(t0, first[:, None], 1)[:, 0], 0.0)
    far = jnp.where(any_occ, jnp.take_along_axis(t1, last[:, None], 1)[:, 0], 0.0)
    return {"t0": t0, "t1": t1, "occ": occ, "near": near, "far": far, "hit": any_occ}
