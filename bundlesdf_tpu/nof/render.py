"""SDF volume rendering over occupancy-guided samples.

Re-design of the reference render path (`nerf_runner.py:1014-1224`):
render_rays (octree trace + dual sampling) -> run_network -> raw2outputs
(sdf2weights band-limited compositing, :1132-1169). The kaolin octree +
CUDA segment sampler are replaced by the dense occupancy grid DDA
(ops/occupancy.py) + cumsum/searchsorted sampler (ops/sampling.py) — all
static shapes, one fused XLA graph per step.

Ray batches are dicts of arrays:
  dirs (N,3) GL-camera ray dirs (z=-1 plane), rgb (N,3), depth (N,),
  mask (N,), frame_id (N,) int32, ray_type (N,), near (N,), far (N,)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from bundlesdf_tpu.nof.models import (NofSpec, nof_forward, nof_sdf,
                                      pose_array_matrices)
from bundlesdf_tpu.ops.occupancy import OccupancyGrid, ray_trace_occupancy
from bundlesdf_tpu.ops.sampling import (draw_occupied_samples,
                                        occupied_sampler_state,
                                        sample_rays_uniform)


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (subset of config.yml keys)."""
    n_samples: int = 64               # N_samples along occupied voxels
    n_samples_around_depth: int = 64  # N_samples_around_depth
    trunc: float = 0.01               # * sc_factor at build time
    neg_trunc_ratio: float = 1.0
    sdf_lambda: float = 5.0
    near: float = 0.1                 # * sc_factor at build time
    far: float = 2.0                  # * sc_factor at build time
    n_trace_steps: int = 128          # DDA steps for the occupancy trace
    raw_noise_std: float = 0.0
    # hierarchical importance sampling (ref nerf_runner.py:1090-1126 —
    # N_importance / N_importance_iter; note the reference branch itself
    # crashes if enabled (raw2outputs called without depth at :1113 while
    # sdf2weights dereferences it), so this is the intended semantics:
    # PDF-resample from the composited weights, re-query, merge, recomposite)
    n_importance: int = 0
    n_importance_iter: int = 1
    # rematerialize the field query in the backward instead of saving its
    # residuals — required at big configs (16 levels x 320 samples OOMs the
    # chip), ~25% step cost at small ones, so the runner enables it by size
    remat: bool = False
    # bfloat16 MLP/SH compute during training (the reference trains under
    # torch AMP fp16, nerf_runner.py:159 — bf16 has the same mantissa
    # budget with f32 exponent range). Outputs and losses stay f32.
    compute_bf16: bool = True
    # emit per-sample SDF spatial gradients ("normals") for the eikonal
    # loss (ref nerf_runner.py:734-738; the reference path itself crashes
    # if enabled — train_loop :686 passes get_normals=False so
    # extras['normals'] never exists — so this implements the intended
    # semantics). TPU-first: central finite differences of the SDF (6
    # extra density-only queries) instead of a nested autodiff through the
    # hash-grid custom VJP.
    eikonal: bool = False
    eikonal_eps: float = 1e-3


def render_rays(params, spec: NofSpec, rcfg: RenderConfig, rays: dict,
                c2w, occ_grid: OccupancyGrid, key, perturb: bool = True,
                trunc=None):
    """Render a ray batch. @c2w: (F,4,4) normalized GL cam-to-object poses.
    @trunc: optional dynamic truncation (annealing); defaults to rcfg.trunc.

    Returns dict: rgb_map (N,3), sdf (N,S), z_vals (N,S), weights (N,S),
    valid_samples (N,S), tf (N,4,4).
    """
    if trunc is None:
        trunc = rcfg.trunc
    k_occ, k_depth, k_noise = jax.random.split(key, 3)
    dirs = rays["dirs"]
    N = dirs.shape[0]
    frame_ids = rays["frame_id"].astype(jnp.int32)
    depth = rays["depth"]

    # corrected camera-to-object transform (ref nerf_runner.py:1051-1053)
    tf = pose_array_matrices(params["pose_array"], frame_ids,
                             spec.max_trans, spec.max_rot_deg) @ c2w[frame_ids]

    viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_o_w = tf[:, :3, 3]
    viewdirs_w = jnp.einsum("nij,nj->ni", tf[:, :3, :3], viewdirs)

    # DDA trace through the occupancy grid; t is euclidean along unit dir,
    # converted to z-depth by |dir_cam.z| (ref nerf_runner.py:991)
    tr = ray_trace_occupancy(occ_grid, rays_o_w, viewdirs_w,
                             n_steps=rcfg.n_trace_steps)
    dz = jnp.abs(viewdirs[:, 2:3])
    t0 = tr["t0"] * dz
    t1 = tr["t1"] * dz

    # cap occupied segments at depth+trunc for valid-depth rays (ref :993-1000)
    valid_depth = (depth >= rcfg.near) & (depth <= rcfg.far)
    t_cap = jnp.where(valid_depth, depth + trunc, jnp.inf)
    sampler = occupied_sampler_state(t0, t1, tr["occ"], t_cap=t_cap)
    z_occ = draw_occupied_samples(sampler, k_occ, rcfg.n_samples,
                                  perturb=perturb)

    # samples around the measured depth (ref nerf_runner.py:1063-1080)
    if rcfg.n_samples_around_depth > 0:
        near_d = (depth - trunc)[:, None]
        far_d = (depth + trunc * rcfg.neg_trunc_ratio)[:, None]
        z_depth = sample_rays_uniform(k_depth, near_d, far_d,
                                      rcfg.n_samples_around_depth,
                                      perturb=perturb)
        # invalid-depth rays fall back to occupancy-guided samples (the
        # t_cap clip is inf for them, so sharing the capped state is exact)
        z_inval = draw_occupied_samples(sampler, k_depth,
                                        rcfg.n_samples_around_depth,
                                        perturb=perturb)
        z_depth = jnp.where(valid_depth[:, None], z_depth, z_inval)
        # two independently-sorted blocks: the hash-grid dedup sees at
        # most one extra run per level at the seam (a per-ray merge sort
        # costs more than it saves — measured)
        z_vals = jnp.concatenate([z_occ, z_depth], axis=-1)
    else:
        z_vals = z_occ

    # points in GL camera frame then to object space (ref run_network :1243)
    pts_cam = dirs[:, None, :] * z_vals[..., None]  # (N,S,3)
    S = z_vals.shape[-1]
    pts_w = jnp.einsum("nij,nsj->nsi", tf[:, :3, :3], pts_cam) + tf[:, None, :3, 3]
    valid_samples = jnp.all(jnp.abs(pts_w) <= 1.0, axis=-1)  # (N,S)

    compute_dtype = jnp.bfloat16 if rcfg.compute_bf16 else jnp.float32

    def field(p, pw, vd, fid):
        return nof_forward(p, spec, pw, viewdirs=vd, frame_ids=fid,
                           ray_mode=True, compute_dtype=compute_dtype)

    if rcfg.remat:
        field = jax.checkpoint(field)

    def query(z):
        """Field query at per-ray z samples -> (raw (N,S,4), valid (N,S))."""
        s = z.shape[-1]
        p_cam = dirs[:, None, :] * z[..., None]
        p_w = (jnp.einsum("nij,nsj->nsi", tf[:, :3, :3], p_cam)
               + tf[:, None, :3, 3])
        valid = jnp.all(jnp.abs(p_w) <= 1.0, axis=-1)
        r = field(params, p_w.reshape(-1, 3),
                  jnp.repeat(viewdirs_w, s, axis=0),
                  jnp.repeat(frame_ids, s, axis=0))
        return r.reshape(N, s, 4), valid

    raw, valid_samples = query(z_vals)
    normals = eik_sdf = eik_valid = None
    if rcfg.eikonal:
        # central-difference SDF gradient at the initial samples (the
        # reference computes normals only for the first network call,
        # nerf_runner.py:1086); one batched density query of 6*N*S points
        eps = rcfg.eikonal_eps
        p = pts_w.reshape(-1, 3)
        offs = jnp.concatenate([jnp.eye(3), -jnp.eye(3)],
                               axis=0).astype(p.dtype) * eps  # (6,3)
        pq = (p[None, :, :] + offs[:, None, :]).reshape(-1, 3)
        # f32 compute regardless of amp: bf16 quantizes the +/-eps SDF
        # difference to zero in flat regions, which both destroys the FD
        # gradient and NaNs the norm's VJP at exactly-zero normals
        sq = nof_sdf(params, spec, pq, compute_dtype=jnp.float32)
        sq = sq.reshape(6, -1)
        normals = ((sq[:3] - sq[3:]) / (2.0 * eps)).T.reshape(N, S, 3)
        # snapshot the matching sdf/validity: importance sampling below
        # may extend the per-ray sample axis past the normals' samples
        eik_sdf = raw[..., 3]
        eik_valid = valid_samples
    sdf = raw[..., 3]
    if rcfg.raw_noise_std > 0:
        sdf = sdf + jax.random.normal(k_noise, sdf.shape) * rcfg.raw_noise_std

    rgb_map, weights = raw2outputs(raw[..., :3], sdf, z_vals, depth, rcfg,
                                   valid_samples, trunc=trunc)

    # hierarchical importance sampling (ref nerf_runner.py:1090-1126)
    if rcfg.n_importance > 0:
        from bundlesdf_tpu.ops.sampling import sample_pdf

        for it in range(rcfg.n_importance_iter):
            k_noise, k_imp = jax.random.split(k_noise)
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_imp = sample_pdf(k_imp, z_mid, weights[..., 1:-1],
                               rcfg.n_importance, det=not perturb)
            # z-sort per ray: the hash-grid dedup backward needs ray-ordered
            # samples (unsorted samples fragment voxel runs past the cap)
            z_imp = jnp.sort(jax.lax.stop_gradient(z_imp), axis=-1)
            raw_imp, valid_imp = query(z_imp)
            z_vals = jnp.concatenate([z_vals, z_imp], axis=-1)
            order = jnp.argsort(z_vals, axis=-1)
            z_vals = jnp.take_along_axis(z_vals, order, axis=-1)
            raw = jnp.take_along_axis(
                jnp.concatenate([raw, raw_imp], axis=1),
                order[..., None], axis=1)
            valid_samples = jnp.take_along_axis(
                jnp.concatenate([valid_samples, valid_imp], axis=-1),
                order, axis=-1)
            sdf = raw[..., 3]
            rgb_map, weights = raw2outputs(raw[..., :3], sdf, z_vals, depth,
                                           rcfg, valid_samples, trunc=trunc)

    out = {"rgb_map": rgb_map, "sdf": sdf, "z_vals": z_vals,
           "weights": weights, "valid_samples": valid_samples, "tf": tf,
           "raw_rgb": raw[..., :3],
           # sample positions of the INITIAL query (ray_samples per ray;
           # free — already computed) for run-budget overflow telemetry
           "pts_w": pts_w}
    if normals is not None:
        out["normals"] = normals
        out["eik_sdf"] = eik_sdf
        out["eik_valid"] = eik_valid
    return out


def raw2outputs(rgb_logits, sdf, z_vals, depth, rcfg: RenderConfig,
                valid_samples, trunc=None):
    """Band-limited SDF compositing (ref raw2outputs + sdf2weights
    nerf_runner.py:1132-1169): bell-shaped weights around the depth-derived
    zero crossing, truncated to [depth-trunc, depth+trunc*neg_ratio],
    zeroed for invalid depth, normalized."""
    if trunc is None:
        trunc = rcfg.trunc
    sdf_from_depth = (depth[:, None] - z_vals) / trunc
    w = (jax.nn.sigmoid(sdf_from_depth * rcfg.sdf_lambda)
         * jax.nn.sigmoid(-sdf_from_depth * rcfg.sdf_lambda))
    band = ((z_vals - depth[:, None] <= trunc * rcfg.neg_trunc_ratio)
            & (z_vals - depth[:, None] >= -trunc))
    depth_invalid = (depth > rcfg.far)[:, None]
    w = jnp.where(depth_invalid, 0.0, jnp.where(band, w, 0.0))
    w = jnp.where(valid_samples, w, 0.0)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-10)
    rgb = jax.nn.sigmoid(rgb_logits)
    rgb_map = jnp.sum(w[..., None] * rgb, axis=-2)
    return rgb_map, w
