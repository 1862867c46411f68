"""Multi-frame Gauss-Newton bundle adjustment on SE(3).

Re-design of the BundleFusion-derived CUDA solver
(`cuda/Solver/SolverBundling.cu`, `SBA.cu`, `LossGPU.cpp`): the problem is
tiny (<=10 frames x 6 DoF) so instead of hand-written PCG kernels we build
the residual vector with fixed dense associations per outer iteration,
autodiff the Jacobian (jacfwd over the 6N delta), assemble JtJ explicitly
(60x60 max) and Cholesky-solve — the idiomatic XLA formulation. Semantics
preserved:
  - sparse feature term ||T_i p_i - T_j p_j||^2 over EntryJ-style
    correspondences (`SolverBundlingEquationsLie.h:37-67`)
  - dense point-to-plane depth ICP on downsampled grids, re-associated every
    outer iteration by windowed projective nearest-neighbor with dist/normal
    gates and score = (1-dot) + dist/thres (`SolverBundlingDenseUtil.h:126-184`)
  - Huber robust weight on the dense residual (robust_delta, `SolverBundling.cu:201-218`)
  - frame pin flags (frame 0 + nerfed keyframes, `Bundler.cpp:906-915`)
  - 7 outer GN iterations (`config_ho3d.yml:35`); the inner 5 PCG iterations
    become an exact solve
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.utils.se3 import se3_exp


@dataclass(frozen=True)
class BAConfig:
    n_outer: int = 7
    image_downscale: int = 4
    dense_dist_thres: float = 0.01      # p2p.max_dist
    dense_normal_thres_deg: float = 20  # p2p.max_normal_angle
    dense_depth_min: float = 0.1
    dense_depth_max: float = 9999.0
    assoc_radius: int = 5               # bundle.depth_association_radius
    # narrower re-association window after the first GN iteration: poses are
    # already near-aligned, and association gathers are the BA's dominant
    # cost on TPU (row-count bound)
    assoc_radius_refine: int = 2
    # search the wide first window at this pixel stride (36 offsets instead
    # of 121 at radius 5) — the first association is coarse by nature and
    # each offset is a full (P*D)-row gather
    assoc_stride_first: int = 2
    # re-associate only in the first `reassoc_iters` GN iterations and
    # freeze the correspondences afterwards. The reference re-associates
    # every outer iteration (SolverBundling.cu:1168-1260), but pose deltas
    # after the first solve are far below the association pixel quantum at
    # the /4 grid (measured: the round-3 synthetic benchmark ADD is
    # unchanged between 1 and 2); set to n_outer to recover the exact
    # reference schedule.
    reassoc_iters: int = 1
    # refine-pass association mode: "window" = (2r+1)-window NN search via
    # per-point dynamic slices (the reference's scheme at every iteration,
    # SolverBundlingDenseUtil.h:126-184); "projective" = single-tap
    # projective data association (KinectFusion-style). After the first
    # wide pass the poses are within the /4-grid pixel quantum, so the
    # refine window rarely picks a different pixel than straight
    # projection — and the slice-descriptor cost (P*D*~125ns per pass) is
    # the BA's roofline on TPU, while a projective gather is ~12 ns/row
    # (round-4 trace: each windowed pass ~23 ms of the ~45 ms BA).
    # Default flipped to projective after the glyph-fixture occluder A/B
    # (docs/PERF.md round-4 batch 2): accuracy-neutral vs windowed refine
    # on the stress protocol, at ~1/10 the association cost.
    assoc_refine_mode: str = "projective"
    # entry-pass association mode: "window" = the reference's wide
    # radius-5 search (strided); "projective" = single-tap; "hybrid" =
    # windowed ONLY for the pairs the caller flags as uncertain (via
    # pair_ij_w/pair_w_dst — the driver flags pairs touching the NEW
    # frame, whose procrustes init carries the only fresh pose error;
    # old-old keyframe pairs were jointly converged by the previous BA
    # call, so their relative motion since is below the /4-grid pixel
    # quantum where projective == windowed) and single-tap projective for
    # the rest. The entry windowed pass is the single biggest op of the
    # steady tracking frame (27.3 ms of the ~45 ms BA, round-4 trace:
    # P*D=196k dynamic slices at ~139 ns descriptor cost each, bf16
    # barely moves it) — hybrid keeps the wide search exactly where the
    # init is uncertain and cuts the slice count by P/P_w. Default =
    # hybrid: on the occluder stress A/B it BEATS all-window (ADD 0.749
    # vs 0.913 cm; PERF.md round-4 batch 2) besides being faster.
    assoc_entry_mode: str = "hybrid"
    # windowed-association scoring layout: "lane" transposes the gathered
    # (D,taps,6) patches to (taps,6,D) so D rides the 128-lane axis;
    # "point" scores in the native (D,taps,6) layout; "lane_fused" asks
    # vmap to emit the gather lane-major (out_axes=-1). Measured on-chip
    # at the steady shapes (P=45, D=4096): entry pass lane 39.0 ms,
    # point 87.6 ms, lane_fused 40.7 ms — the relayout copy is far
    # cheaper than scoring with only 6 elements on the 128-lane axis,
    # so lane-major stays the default.
    assoc_layout: str = "lane"
    # windowed-association scoring precision: "bf16" gathers and scores
    # the candidate windows in bfloat16 (halving the dynamic-slice bytes —
    # measured ~0.1 ns/B marginal slice cost, so bytes are ~half the
    # entry-pass time) and then re-fetches the SELECTED candidate in f32
    # with one per-point gather row, recomputing the gates and Huber
    # weight in f32. Only the argmin SELECTION sees bf16 rounding
    # (~1-2 mm position quantum at 0.5 m) — near-tie candidates may swap,
    # the same deviation class as the strided entry window; residuals are
    # exact for the chosen candidate. "f32" = exact reference scoring.
    # Default = bf16: occluder A/B delta vs f32 < 0.01 cm ADD
    # (PERF.md round-4 batch 2) at half the gather bytes.
    assoc_dtype: str = "bf16"
    # stop outer GN iterations once the max per-frame update norm drops
    # below this (the reference carries the same convergence early-out
    # behind ENABLE_EARLY_OUT, EvalGNConvergence < 5e-3,
    # SolverBundling.cu:1244-1252; 0 disables = reference default build)
    early_out_delta: float = 1e-4
    n_dense_pts: int = 4096             # valid src points per frame (padded)
    robust_delta: float = 0.005
    w_sparse: float = 1.0               # bundle.w_fm
    w_dense: float = 1.0                # bundle.w_p2p
    # dense photometric term: intensity residual I_tgt(pi(T_i^-1 T_j p)) -
    # I_src(p's pixel) over the same src points as the depth term
    # (reference parity: SolverBundling.cu:236-257 builds this residual
    # from CUDACache intensity+derivative pyramids; its weight defaults to
    # 0 in SBA.cu:170 m_localWeightsDenseColor but is config-reachable).
    # TPU formulation: differentiable bilinear sample of the grey map at
    # the projected coords — autodiff through the bilinear weights IS the
    # image-gradient chain rule the reference hand-codes from dIdx/dIdy.
    # Requires grey maps in the call (bundle_adjust grey_down /
    # bundle_adjust_pooled pool_greys); 0 = off (no extra rows).
    # Weight scale: the color rows' pose Jacobian is ~dI/du * fx/z — two
    # orders of magnitude steeper than the metric point-to-plane rows —
    # so useful weights are SMALL (0.05-0.1 measured optimal on the orbit
    # fixture; >=1 lets the non-convex photometric landscape overpower
    # the geometry and corrupt the solve). Matches the reference's tiny
    # dense-color weights relative to depth (SBA.cu weightsDenseColor).
    w_dense_color: float = 0.0          # bundle.w_dense_color
    robust_delta_color: float = 0.03    # huber knee, intensity in [0,1]
    #   (adjacent-view |r| at GT alignment measures ~0.02 mean on the
    #   fixture; knee just above it downweights occlusion/specular tails)
    damping: float = 1e-6


def _pose_update(poses, delta, flags):
    """poses <- exp(delta) @ poses, zeroing pinned frames' deltas."""
    delta = delta.reshape(-1, 6) * flags[:, None]
    return se3_exp(delta) @ poses


def _dense_associate(poses, xyz, nrm, K, pair_ij, src_idx, src_valid,
                     cfg: BAConfig, radius: int, stride: int = 1):
    """Windowed projective nearest-neighbor association for every ordered
    frame pair. @xyz,@nrm: (N,h,w,3) downsampled maps. @pair_ij: (P,2) int.
    @src_idx/@src_valid: (N,D) flat pixel indices of valid object points per
    frame (padded) — association runs on these D points only, not the full
    grid.

    TPU structure (profiled on-chip, see docs/PERF.md round 3):
      1. ONE (W,W,6) patch dynamic-slice per src point — per-slice cost on
         TPU is near-flat in slice bytes (~100-150 ns row-descriptor
         bound), so D slices beat both the per-offset gather (round 2,
         (2r+1)^2 * D rows) and the per-dy row gather (ndy * D rows).
      2. Lane-major scoring: every (D,*) tensor is transposed so D rides
         the 128-lane axis — (taps, D) layouts keep the VPU full where the
         (D, ndy, W) layout ran ~5-wide.
      3. The per-frame src point/normal gathers are hoisted OUT of the
         per-pair vmap (N*D rows once instead of P*D*2 rows).
    @stride applies to the v-axis of the window (taps are the strided rows
    of the full patch; u-span rides along free — a candidate superset of
    the reference's strided grid).

    Border semantics: the patch start is clamped so the whole (W,W) window
    lies in-image (a border point sees a shifted-but-valid window); the
    reference clips per-candidate instead. Identical except within r px of
    the image border, where the object never lives at these workloads.

    Returns per (pair, point): tgt point/normal in tgt cam, src point in
    src cam, found flag, huber weight — all with stop_gradient semantics
    (the association is fixed during the linearized solve)."""
    N, h, w, _ = xyz.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cosn = jnp.cos(jnp.deg2rad(cfg.dense_normal_thres_deg))
    r = radius
    W = 2 * r + 1
    packed = jnp.concatenate([xyz, nrm], axis=-1)  # (N,h,w,6)
    # bf16 mode: gather + score the windows at half the slice bytes, then
    # re-fetch the selected candidate in f32 (see BAConfig.assoc_dtype)
    use_bf16 = cfg.assoc_dtype == "bf16"
    packed_s = packed.astype(jnp.bfloat16) if use_bf16 else packed
    packed_flat = packed.reshape(N, h * w, 6) if use_bf16 else None
    sel_dy = np.arange(0, W, stride)
    ndy = len(sel_dy)
    n_taps = ndy * W
    # stride-2 windows touch only same-parity rows: gather from a
    # parity-split (2, h/2, w, 6) view so the patch slice fetches exactly
    # the ndy rows it uses instead of W (the slice is byte-bound at W=11)
    par2 = stride == 2 and h % 2 == 0
    if par2:
        packed_par = packed_s.reshape(N, h // 2, 2, w, 6) \
            .transpose(0, 2, 1, 3, 4)              # (N,2,h/2,w,6)

    # per-frame src gathers, hoisted out of the pair loop
    src_p_all = jnp.take_along_axis(xyz.reshape(N, -1, 3),
                                    src_idx[..., None], axis=1)  # (N,D,3)
    src_n_all = jnp.take_along_axis(nrm.reshape(N, -1, 3),
                                    src_idx[..., None], axis=1)

    def per_pair(ij):
        i, j = ij[0], ij[1]
        T = jnp.linalg.inv(poses[i]) @ poses[j]  # src(j) cam -> tgt(i) cam
        src_p = src_p_all[j]
        src_n = src_n_all[j]
        src_ok = src_valid[j] & (src_p[:, 2] > cfg.dense_depth_min) \
            & (src_p[:, 2] < cfg.dense_depth_max) \
            & (jnp.abs(src_n[:, 0]) > 0)
        p_tgt = src_p @ T[:3, :3].T + T[:3, 3]
        n_tgt_of_src = src_n @ T[:3, :3].T
        u = jnp.round(p_tgt[:, 0] / jnp.maximum(p_tgt[:, 2], 1e-6) * fx + cx)
        v = jnp.round(p_tgt[:, 1] / jnp.maximum(p_tgt[:, 2], 1e-6) * fy + cy)
        u = u.astype(jnp.int32)
        v = v.astype(jnp.int32)

        u0 = jnp.clip(u - r, 0, w - W)                 # (D,)
        v0 = jnp.clip(v - r, 0, h - W)
        in_img = (u >= -r) & (u < w + r) & (v >= -r) & (v < h + r)
        D = src_p.shape[0]

        # "lane_fused" asks vmap to emit the gathered patches lane-major
        # directly (out_axes=-1 -> (ndy,W,6,D)): XLA folds the relayout
        # into the gather's output instead of a separate transpose copy
        out_ax = -1 if cfg.assoc_layout == "lane_fused" else 0
        if par2:
            tgt = packed_par[i]                        # (2,h/2,w,6)

            def patch(vv, uu):
                # row 2k+p of the image is row k of parity plane p
                return jax.lax.dynamic_slice(
                    tgt, (vv & 1, vv >> 1, uu, 0), (1, ndy, W, 6))[0]

            block = jax.vmap(patch, out_axes=out_ax)(v0, u0)
        else:
            tgt = packed_s[i]                          # (h,w,6)

            def patch(vv, uu):
                return jax.lax.dynamic_slice(
                    tgt, (vv, uu, 0), (W, W, 6))[sel_dy]

            block = jax.vmap(patch, out_axes=out_ax)(v0, u0)
        if cfg.assoc_layout == "point":
            # native (D, taps, 6) layout — no relayout copy, but the
            # minor dim 6 leaves 122 of 128 lanes idle: measured 2.2x
            # SLOWER than lane-major at the steady shapes (87.6 vs
            # 39.0 ms entry pass); kept only as an A/B arm
            Bp = block.reshape(D, n_taps, 6)
            tp = Bp[..., :3]                           # (D, taps, 3)
            tn = Bp[..., 3:]
            dd = tp - p_tgt[:, None, :]
            dist = jnp.linalg.norm(dd, axis=-1)        # (D, taps)
            dot = jnp.sum(tn * n_tgt_of_src[:, None, :], axis=-1)
            ok = (tp[..., 2] > 0.1) & (dist <= cfg.dense_dist_thres) \
                & (dot >= cosn) & in_img[:, None]
            score = jnp.where(ok, (1.0 - dot) + dist / cfg.dense_dist_thres,
                              jnp.inf)                 # (D, taps)
            best_s = jnp.min(score, axis=1)
            k = jnp.argmin(score, axis=1)              # (D,)
            picked = jnp.take_along_axis(Bp, k[:, None, None], axis=1)[:, 0]
            best_p = picked[:, :3]
            best_n = picked[:, 3:]
        else:
            # lane-major: (taps, 6, D)
            if cfg.assoc_layout == "lane_fused":
                B = block.reshape(n_taps, 6, D)        # already lane-major
            else:
                B = jnp.transpose(block.reshape(D, n_taps, 6), (1, 2, 0))
            tpx, tpy, tpz = B[:, 0], B[:, 1], B[:, 2]  # (taps, D)
            tnx, tny, tnz = B[:, 3], B[:, 4], B[:, 5]
            pT = p_tgt.T                               # (3, D)
            nS = n_tgt_of_src.T
            ddx = tpx - pT[0][None]
            ddy = tpy - pT[1][None]
            ddz = tpz - pT[2][None]
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            dot = tnx * nS[0][None] + tny * nS[1][None] + tnz * nS[2][None]
            ok = (tpz > 0.1) & (dist <= cfg.dense_dist_thres) \
                & (dot >= cosn) & in_img[None, :]
            score = jnp.where(ok, (1.0 - dot) + dist / cfg.dense_dist_thres,
                              jnp.inf)                 # (taps, D)
            best_s = jnp.min(score, axis=0)
            k = jnp.argmin(score, axis=0)              # (D,)
            sel = jnp.arange(n_taps)[:, None] == k[None, :]
            pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=0)
            best_p = jnp.stack([pick(tpx), pick(tpy), pick(tpz)], axis=1)
            best_n = jnp.stack([pick(tnx), pick(tny), pick(tnz)], axis=1)
        found = jnp.isfinite(best_s) & src_ok
        if use_bf16:
            # re-fetch the SELECTED candidate in f32 (one gather row per
            # point, ~12 ns/row) and recompute the gates exactly — only
            # the argmin selection saw bf16 storage rounding
            dy = jnp.take(jnp.asarray(sel_dy, jnp.int32), k // W)
            dx = k % W
            rowi = (v0 + dy) * w + (u0 + dx)
            rowf = jnp.take(packed_flat[i], rowi, axis=0)   # (D,6)
            best_p, best_n = rowf[:, :3], rowf[:, 3:]
            dist_f = jnp.linalg.norm(best_p - p_tgt, axis=-1)
            dot_f = jnp.sum(best_n * n_tgt_of_src, axis=-1)
            found = found & (best_p[:, 2] > 0.1) \
                & (dist_f <= cfg.dense_dist_thres) & (dot_f >= cosn)
        # huber weight at the association linearization point
        res0 = jnp.sum((best_p - p_tgt) * best_n, axis=-1)
        absr = jnp.abs(res0)
        hub = jnp.where(absr <= cfg.robust_delta, 1.0,
                        cfg.robust_delta / jnp.maximum(absr, 1e-12))
        return {"src_p": src_p, "tgt_p": best_p, "tgt_n": best_n,
                "found": found, "huber": hub}

    out = jax.vmap(per_pair)(pair_ij)
    return jax.lax.stop_gradient(out)


def _projective_associate(poses, xyz, nrm, K, pair_ij, src_idx, src_valid,
                          cfg: BAConfig):
    """Single-tap projective data association: project each src point into
    the tgt frame and take THAT pixel (no window search). Same dist/normal
    gates and Huber weighting as `_dense_associate`. One gather row per
    (pair, point) — ~12 ns/row vs ~125 ns/slice for the windowed search,
    which is the BA's TPU roofline; used for refine passes where the pose
    delta since the previous association is below the pixel quantum."""
    N, h, w, _ = xyz.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    cosn = jnp.cos(jnp.deg2rad(cfg.dense_normal_thres_deg))
    packed = jnp.concatenate([xyz, nrm], axis=-1).reshape(N, h * w, 6)

    src_p_all = jnp.take_along_axis(xyz.reshape(N, -1, 3),
                                    src_idx[..., None], axis=1)  # (N,D,3)
    src_n_all = jnp.take_along_axis(nrm.reshape(N, -1, 3),
                                    src_idx[..., None], axis=1)

    def per_pair(ij):
        i, j = ij[0], ij[1]
        T = jnp.linalg.inv(poses[i]) @ poses[j]
        src_p = src_p_all[j]
        src_n = src_n_all[j]
        src_ok = src_valid[j] & (src_p[:, 2] > cfg.dense_depth_min) \
            & (src_p[:, 2] < cfg.dense_depth_max) \
            & (jnp.abs(src_n[:, 0]) > 0)
        p_tgt = src_p @ T[:3, :3].T + T[:3, 3]
        n_tgt_of_src = src_n @ T[:3, :3].T
        u = jnp.round(p_tgt[:, 0] / jnp.maximum(p_tgt[:, 2], 1e-6) * fx + cx)
        v = jnp.round(p_tgt[:, 1] / jnp.maximum(p_tgt[:, 2], 1e-6) * fy + cy)
        in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        ui = jnp.clip(u.astype(jnp.int32), 0, w - 1)
        vi = jnp.clip(v.astype(jnp.int32), 0, h - 1)
        row = jnp.take(packed[i], vi * w + ui, axis=0)    # (D,6)
        best_p, best_n = row[:, :3], row[:, 3:]
        dist = jnp.linalg.norm(best_p - p_tgt, axis=-1)
        dot = jnp.sum(best_n * n_tgt_of_src, axis=-1)
        found = (best_p[:, 2] > 0.1) & (dist <= cfg.dense_dist_thres) \
            & (dot >= cosn) & in_img & src_ok
        res0 = jnp.sum((best_p - p_tgt) * best_n, axis=-1)
        absr = jnp.abs(res0)
        hub = jnp.where(absr <= cfg.robust_delta, 1.0,
                        cfg.robust_delta / jnp.maximum(absr, 1e-12))
        return {"src_p": src_p, "tgt_p": best_p, "tgt_n": best_n,
                "found": found, "huber": hub}

    out = jax.vmap(per_pair)(pair_ij)
    return jax.lax.stop_gradient(out)


@functools.partial(jax.jit, static_argnames=("cfg",))
def bundle_adjust(poses0, K_down, xyz_down, nrm_down, pair_ij,
                  corr_i, corr_j, corr_pi, corr_pj, corr_valid,
                  update_flags, src_idx, src_valid,
                  cfg: BAConfig = BAConfig(), pair_valid=None,
                  pair_ij_w=None, pair_w_dst=None, grey_down=None):
    """Jointly refine frame poses.

    @poses0: (N,4,4) cam-in-model. @K_down: (3,3) intrinsics of the
    downsampled grids. @xyz_down/@nrm_down: (N,h,w,3) camera-space maps.
    @pair_ij: (P,2) ordered (tgt i, src j) frame-index pairs for the dense
    term. Sparse correspondences (padded): @corr_i/@corr_j (C,) frame
    indices; @corr_pi/@corr_pj (C,3) points in the respective CAMERA frames;
    @corr_valid (C,). @update_flags: (N,) 1=optimize, 0=pinned.
    @src_idx/@src_valid: (N,D) per-frame valid-point pixel indices.
    @pair_ij_w/@pair_w_dst (hybrid entry mode only): (Pw,2) pair subset to
    entry-associate with the wide window, and (Pw,) destination row of each
    in @pair_ij (>=P for padding — dropped on scatter).
    Returns refined (N,4,4) poses.
    """
    N = poses0.shape[0]
    flags = update_flags.astype(jnp.float32)
    if pair_valid is None:
        pair_valid = jnp.ones(pair_ij.shape[0], jnp.float32)

    # dense photometric term (SolverBundling.cu:236-257): hoisted gathers
    use_color = cfg.w_dense_color > 0 and grey_down is not None
    if use_color:
        hg, wg = grey_down.shape[1], grey_down.shape[2]
        gd_flat = grey_down.reshape(N, -1)                      # (N, hw)
        I_src_all = jnp.take_along_axis(gd_flat, src_idx, axis=1)
        I_tgt_pair = gd_flat[pair_ij[:, 0]]                     # (P, hw)
        I_src_pair = I_src_all[pair_ij[:, 1]]                   # (P, D)
        src_v_pair = src_valid[pair_ij[:, 1]].astype(jnp.float32)
        fxc, fyc = K_down[0, 0], K_down[1, 1]
        cxc, cyc = K_down[0, 2], K_down[1, 2]

    def outer(poses, radius: int, stride: int = 1, assoc=None):
        if assoc is None:
            assoc = _dense_associate(poses, xyz_down, nrm_down, K_down,
                                     pair_ij, src_idx, src_valid, cfg,
                                     radius, stride=stride)

        def residuals(delta):
            T = _pose_update(poses, delta, flags)  # (N,4,4)
            # sparse: T_i p_i - T_j p_j
            Ti = T[corr_i]
            Tj = T[corr_j]
            wi = jnp.einsum("cij,cj->ci", Ti[:, :3, :3], corr_pi) + Ti[:, :3, 3]
            wj = jnp.einsum("cij,cj->ci", Tj[:, :3, :3], corr_pj) + Tj[:, :3, 3]
            r_sparse = (wi - wj) * (jnp.sqrt(cfg.w_sparse)
                                    * corr_valid.astype(jnp.float32))[:, None]
            # dense point-to-plane in tgt cam: n . (p_tgt - T_i^-1 T_j p_src)
            Ti_d = T[pair_ij[:, 0]]
            Tj_d = T[pair_ij[:, 1]]
            Rrel = jnp.einsum("pji,pjk->pik", Ti_d[:, :3, :3], Tj_d[:, :3, :3])
            trel = jnp.einsum("pji,pj->pi", Ti_d[:, :3, :3],
                              Tj_d[:, :3, 3] - Ti_d[:, :3, 3])
            p_in_tgt = jnp.einsum("pij,pmj->pmi", Rrel, assoc["src_p"]) \
                + trel[:, None, :]
            r_dense = jnp.sum((assoc["tgt_p"] - p_in_tgt) * assoc["tgt_n"],
                              axis=-1)
            w_d = jnp.sqrt(cfg.w_dense * assoc["huber"]) \
                * assoc["found"].astype(jnp.float32) \
                * pair_valid[:, None]
            r_dense = r_dense * w_d
            parts = [r_sparse.reshape(-1), r_dense.reshape(-1)]
            if use_color:
                # photometric: project the transformed src point and
                # bilinear-sample the tgt grey; the bilinear weights carry
                # the pose gradient (the reference's dIdx/dIdy chain rule,
                # SolverBundlingEquationsLie.h color block)
                z = jnp.maximum(p_in_tgt[..., 2], 1e-6)
                u = p_in_tgt[..., 0] / z * fxc + cxc        # (P, D)
                v = p_in_tgt[..., 1] / z * fyc + cyc
                u0 = jnp.floor(u)
                v0 = jnp.floor(v)
                fu = u - u0
                fv = v - v0
                u0i = jnp.clip(u0.astype(jnp.int32), 0, wg - 2)
                v0i = jnp.clip(v0.astype(jnp.int32), 0, hg - 2)
                base = v0i * wg + u0i
                I00 = jnp.take_along_axis(I_tgt_pair, base, axis=1)
                I01 = jnp.take_along_axis(I_tgt_pair, base + 1, axis=1)
                I10 = jnp.take_along_axis(I_tgt_pair, base + wg, axis=1)
                I11 = jnp.take_along_axis(I_tgt_pair, base + wg + 1, axis=1)
                It = (I00 * (1 - fu) * (1 - fv) + I01 * fu * (1 - fv)
                      + I10 * (1 - fu) * fv + I11 * fu * fv)
                r_c = It - I_src_pair
                # gates + robust weight are fixed at the linearization
                # point (same stop-gradient semantics as the association).
                # assoc["found"] is essential: the reference evaluates the
                # color residual only where the depth correspondence search
                # succeeded (same findDenseCorr loop) — without it, self-
                # occluded src points (back faces) project onto unrelated
                # surface intensity and corrupt the solve.
                gate = jax.lax.stop_gradient(
                    ((u >= 0) & (u <= wg - 1) & (v >= 0) & (v <= hg - 1)
                     & (p_in_tgt[..., 2] > cfg.dense_depth_min)).astype(
                        jnp.float32)
                    * assoc["found"].astype(jnp.float32)) * src_v_pair
                absr = jax.lax.stop_gradient(jnp.abs(r_c))
                hub_c = jnp.where(
                    absr <= cfg.robust_delta_color, 1.0,
                    cfg.robust_delta_color / jnp.maximum(absr, 1e-12))
                w_c = jnp.sqrt(cfg.w_dense_color * hub_c) * gate \
                    * pair_valid[:, None]
                parts.append((r_c * w_c).reshape(-1))
            return jnp.concatenate(parts)

        delta0 = jnp.zeros(N * 6)
        r0 = residuals(delta0)
        J = jax.jacfwd(residuals)(delta0)  # (R, 6N)
        JtJ = J.T @ J
        Jtr = J.T @ r0
        # pin frames: force identity rows for their delta entries
        pin = jnp.repeat(flags, 6)
        JtJ = JtJ * pin[:, None] * pin[None, :] \
            + jnp.diag(jnp.where(pin > 0, cfg.damping, 1.0))
        Jtr = Jtr * pin
        delta = -jnp.linalg.solve(JtJ, Jtr)
        # max per-frame update norm — the reference's EvalGNConvergence
        # measure (SolverBundling.cu early-out)
        dmax = jnp.max(jnp.linalg.norm(
            delta.reshape(-1, 6) * flags[:, None], axis=-1))
        return _pose_update(poses, delta, flags), assoc, dmax

    # wide (strided) association window only on the first iteration (poses
    # may be far off); narrow window while it < reassoc_iters; then the
    # association FREEZES in the loop carry and the remaining GN
    # iterations reuse it. One loop body (assoc shapes are radius-
    # independent) keeps the compile small.
    if cfg.assoc_entry_mode == "projective":
        entry_assoc = _projective_associate(poses0, xyz_down, nrm_down,
                                            K_down, pair_ij, src_idx,
                                            src_valid, cfg)
        poses, assoc, dmax = outer(poses0, cfg.assoc_radius,
                                   assoc=entry_assoc)
    elif cfg.assoc_entry_mode == "hybrid" and pair_ij_w is None:
        # hybrid needs the caller's uncertain-pair subset; a
        # default-constructed BAConfig without pair_ij_w/pair_w_dst falls
        # back to the all-window entry pass (correct for every pair)
        # instead of crashing at trace time in _dense_associate
        poses, assoc, dmax = outer(poses0, cfg.assoc_radius,
                                   stride=max(1, cfg.assoc_stride_first))
    elif cfg.assoc_entry_mode == "hybrid":
        # projective single-tap for every pair (cheap: one gather row per
        # point), then OVERWRITE the uncertain pairs' rows with the wide
        # windowed search — only Pw*D slices instead of P*D
        entry_assoc = _projective_associate(poses0, xyz_down, nrm_down,
                                            K_down, pair_ij, src_idx,
                                            src_valid, cfg)
        w_assoc = _dense_associate(poses0, xyz_down, nrm_down, K_down,
                                   pair_ij_w, src_idx, src_valid, cfg,
                                   cfg.assoc_radius,
                                   stride=max(1, cfg.assoc_stride_first))
        entry_assoc = jax.tree.map(
            lambda a, b: a.at[pair_w_dst].set(b, mode="drop"),
            entry_assoc, w_assoc)
        poses, assoc, dmax = outer(poses0, cfg.assoc_radius,
                                   assoc=entry_assoc)
    else:
        poses, assoc, dmax = outer(poses0, cfg.assoc_radius,
                                   stride=max(1, cfg.assoc_stride_first))

    def refine_assoc(p):
        if cfg.assoc_refine_mode == "projective":
            return _projective_associate(p, xyz_down, nrm_down, K_down,
                                         pair_ij, src_idx, src_valid, cfg)
        return _dense_associate(p, xyz_down, nrm_down, K_down, pair_ij,
                                src_idx, src_valid, cfg,
                                cfg.assoc_radius_refine)

    def reassoc(it, poses, assoc):
        return jax.lax.cond(it < cfg.reassoc_iters, refine_assoc,
                            lambda p: assoc, poses)

    if cfg.early_out_delta > 0:
        # data-dependent trip count: stop refining once the GN update is
        # converged (saves ~half the outer iterations at steady tracking;
        # identical result to within early_out_delta by construction)
        def cond(carry):
            it, _, _, dmax = carry
            return (it < cfg.n_outer) & (dmax > cfg.early_out_delta)

        def body(carry):
            it, poses, assoc, _ = carry
            assoc = reassoc(it, poses, assoc)
            poses, _, dmax = outer(poses, cfg.assoc_radius_refine,
                                   assoc=assoc)
            return it + 1, poses, assoc, dmax

        _, poses, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(1), poses, assoc, dmax))
    else:
        def body(it, carry):
            poses, assoc = carry
            assoc = reassoc(it, poses, assoc)
            poses, _, _ = outer(poses, cfg.assoc_radius_refine, assoc=assoc)
            return poses, assoc

        poses, _ = jax.lax.fori_loop(1, cfg.n_outer, body, (poses, assoc))
    return poses


@functools.partial(jax.jit, static_argnames=("cfg", "factor", "pre_decim"))
def bundle_adjust_pooled(pool_xyzs, pool_nrms, slots, slot_live, poses0, K,
                         pair_ij, corr_i, corr_j, corr_pi, corr_pj,
                         corr_valid, update_flags, src_idx, src_valid,
                         factor: int, cfg: BAConfig = BAConfig(),
                         pair_valid=None, pool_valids=None, nf_idx=None,
                         kf_slots=None, kf_poses=None, kf_window_idx=None,
                         covis_thres_cos=None, pre_decim: int = 1,
                         pair_ij_w=None, pair_w_dst=None, pool_greys=None):
    """bundle_adjust fed straight from the FramePool: the slot gather, the
    padded-slot zeroing, and the /factor downsample run inside the SAME
    program (the round-3 driver paid 4-5 extra dispatches per BA call for
    gather_slots + concat-pad + downsample through the tunnel).

    @pool_xyzs/@pool_nrms: pool maps already decimated by @pre_decim
    (pass the pool's half-res pyramid with pre_decim=2 for even factors —
    gathering full-res slots just to stride them cost ~35 MB + a device
    copy per call). @factor is the TOTAL downscale relative to full res;
    factor %% pre_decim must be 0.
    @slots: (N_pad,) pool slots (padded entries point anywhere);
    @slot_live: (N_pad,) 1.0 for real frames, 0.0 for padding (zeroes the
    maps, so padded frames contribute no dense residuals).

    When the admission args are given (@pool_valids, @nf_idx, @kf_slots
    (KF,), @kf_poses (KF,4,4), @kf_window_idx (KF,) int32 index into the
    BA window or -1, @covis_thres_cos), the program ALSO computes the
    keyframe-admission covisibility of the new frame against every
    keyframe at the POST-BA poses (ref checkAndAddKeyframe
    Bundler.cpp:263-323 runs right after optimizeGPU) — the driver then
    needs zero extra dispatches for admission. The covisibility runs at
    half resolution (ref Frame.h stride-2), so admission args require
    pre_decim <= 2. Returns (poses, covis) in that case, else poses."""
    from bundlesdf_tpu.tracker.pool import covis_core

    assert factor % pre_decim == 0
    s = factor // pre_decim
    live = slot_live[:, None, None, None]
    xyz = pool_xyzs[slots] * live
    nrm = pool_nrms[slots] * live
    xyz_d = xyz[:, ::s, ::s]
    nrm_d = nrm[:, ::s, ::s]
    grey_d = None
    if pool_greys is not None and cfg.w_dense_color > 0:
        # pool greys arrive at the pre_decim pyramid level (greys_h is a
        # centered [1,2,1]/4 pyramid step). Unlike the geometry maps,
        # intensity must be ANTIALIASED down to the BA grid, not strided:
        # pure decimation of real texture leaves alias noise whose
        # bilinear "gradient" misdirects GN (measured on the orbit
        # fixture: strided grey at factor 4 drove the solve from 1.25 mm
        # to 16.8 mm; the filtered pyramid + small weight improves it to
        # 0.66 mm — docs/PERF.md round 5). Iterated centered 121 steps
        # keep sample i on full pixel i*s, the grid K_down assumes.
        gsel = pool_greys[slots] * slot_live[:, None, None]
        ss = s
        assert ss & (ss - 1) == 0, f"grey stride {s} must be a power of 2"
        while ss > 1:
            gp = jnp.pad(gsel, ((0, 0), (1, 1), (1, 1)), mode="edge")
            sm = (gp[:, :-2] + 2.0 * gp[:, 1:-1] + gp[:, 2:]) * 0.25
            sm = (sm[:, :, :-2] + 2.0 * sm[:, :, 1:-1]
                  + sm[:, :, 2:]) * 0.25
            gsel = sm[:, ::2, ::2]
            ss //= 2
        grey_d = gsel
    K_d = jnp.asarray(K).astype(jnp.float32)
    K_d = K_d.at[0].mul(1.0 / factor).at[1].mul(1.0 / factor)
    poses = bundle_adjust(poses0, K_d, xyz_d, nrm_d, pair_ij, corr_i,
                          corr_j, corr_pi, corr_pj, corr_valid,
                          update_flags, src_idx, src_valid, cfg,
                          pair_valid=pair_valid,
                          pair_ij_w=pair_ij_w, pair_w_dst=pair_w_dst,
                          grey_down=grey_d)
    if nf_idx is None:
        return poses
    assert pre_decim <= 2
    c = 2 // pre_decim
    cov_xyzs = pool_xyzs[:, ::c, ::c]
    cov_nrms = pool_nrms[:, ::c, ::c]
    cov_valids = pool_valids[:, ::c, ::c]
    nf_pose = poses[nf_idx]
    in_window = kf_window_idx >= 0
    kf_pose_eff = jnp.where(in_window[:, None, None],
                            poses[jnp.maximum(kf_window_idx, 0)], kf_poses)
    Ts = jnp.linalg.inv(kf_pose_eff) @ nf_pose  # nf cam -> kf cam
    src_slots = jnp.full(kf_slots.shape, slots[nf_idx])
    covis = covis_core(cov_xyzs, cov_nrms, cov_valids, src_slots, Ts,
                       covis_thres_cos)
    return poses, covis


def downsample_maps(xyz, nrm, K, factor: int):
    """Stride-subsample xyz/normal maps + intrinsics for the dense term
    (replaces `CUDACache` construction, `LossGPU.cpp:93-99`)."""
    xyz_d = xyz[..., ::factor, ::factor, :]
    nrm_d = nrm[..., ::factor, ::factor, :]
    K_d = jnp.asarray(K).astype(jnp.float32)
    K_d = K_d.at[0].mul(1.0 / factor).at[1].mul(1.0 / factor)
    return xyz_d, nrm_d, K_d
