"""Device-resident frame-map pool + fused per-frame tracking kernels.

Round-3 redesign of the tracking hot path (round-2 verdict: ~12+ device
dispatches per frame, each paying 10-35 ms tunnel RTT, gave ~3 s/frame vs
the >=10 FPS target). All live frames' preprocessed maps (xyz, normals,
depth, validity) now live in ONE set of stacked device arrays; the
per-frame pipeline becomes a handful of fused jitted programs that index
the pool by slot:

  - `preprocess_into_pool`: the whole depth chain (erode -> 2x bilateral
    -> xyz -> normals -> edge filter -> mask) PLUS the pool write PLUS the
    valid-point count, one dispatch (ref Frame.cpp:24-334 + :453-464).
  - `covis_slots`: covisibility for an arbitrary batch of (slot, T)
    items, one dispatch (ref Frame.h:122-165) — all of a frame's
    covisibility queries (ref re-selection, BA selection, match-pair
    gating, keyframe admission) batch through this.
  - `lift_ransac_slots`: match lifting (flat gather from the pool),
    3D-validity gating, model-frame transform, and multi-pair RANSAC as
    ONE program for all pairs of a find_corres call (ref
    rawMatchesToCorres FeatureManager.cpp:2720-2769 + cuda_ransac.cu),
    with a single host pull of the small per-match outputs.

The pool is functionally updated (donated buffers), so slot writes are
in-place on device. Slot bookkeeping (frame id <-> slot, free list) stays
host-side. Capacity doubles when full (one reallocation + recompile per
doubling; keyframe pools grow to ~100s of frames on HO3D).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from bundlesdf_tpu.ops.preprocess import (bilateral_filter_depth,
                                          compute_normals, depth_to_xyz,
                                          erode_depth, filter_depth_edges)
from bundlesdf_tpu.tracker.ransac import ransac_pose

_VALID_MIN = 0.1


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6),
                   static_argnames=("erode_radius", "bf_radius"))
def preprocess_into_pool(xyzs, nrms, depths, valids, xyzs_h, nrms_h,
                         valids_h, slot, depth, K, mask,
                         erode_radius=1, erode_diff=0.001, erode_ratio=0.8,
                         bf_radius=2, sigma_d=2.0, sigma_r=100000.0,
                         zfar=1.0,
                         edge_angle_thres_rad=10.0 * math.pi / 180.0):
    """Fused depth chain + pool slot write + valid count: ONE dispatch.
    Also maintains the half-res strided pyramid (xyzs_h = xyzs[:, ::2,
    ::2]) that covisibility and BA consume — gathering full-res slots and
    striding in-program cost ~35 MB + a device copy per BA call.
    Returns (xyzs, nrms, depths, valids, xyzs_h, nrms_h, valids_h,
    n_valid)."""
    d = erode_depth(depth, radius=erode_radius, diff=erode_diff,
                    ratio=erode_ratio, zfar=zfar)
    d = bilateral_filter_depth(d, radius=bf_radius, sigma_d=sigma_d,
                               sigma_r=sigma_r, zfar=zfar)
    d = bilateral_filter_depth(d, radius=bf_radius, sigma_d=sigma_d,
                               sigma_r=sigma_r, zfar=zfar)
    xyz = depth_to_xyz(d, K)
    nrm = compute_normals(xyz)
    d = filter_depth_edges(d, nrm, K, edge_angle_thres_rad)
    keep = mask > 0
    d = jnp.where(keep, d, 0.0)
    nrm = jnp.where(keep[..., None], nrm, 0.0)
    xyz = depth_to_xyz(d, K)
    nrm = jnp.where((d >= _VALID_MIN)[..., None], nrm, 0.0)
    valid = (d > _VALID_MIN) & keep
    n_valid = jnp.sum(valid.astype(jnp.int32))
    return (xyzs.at[slot].set(xyz), nrms.at[slot].set(nrm),
            depths.at[slot].set(d), valids.at[slot].set(valid),
            xyzs_h.at[slot].set(xyz[::2, ::2]),
            nrms_h.at[slot].set(nrm[::2, ::2]),
            valids_h.at[slot].set(valid[::2, ::2]), n_valid)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5, 6))
def mask_pool_slot(xyzs, nrms, depths, valids, xyzs_h, nrms_h, valids_h,
                   slot, mask):
    """Re-invalidate a pooled frame by a (possibly shrunken) mask
    (ref invalidatePixelsByMask Frame.cpp:432-451). One dispatch."""
    keep = mask > 0
    d = jnp.where(keep, depths[slot], 0.0)
    xyz = jnp.where(keep[..., None], xyzs[slot], 0.0)
    nrm = jnp.where(keep[..., None], nrms[slot], 0.0)
    valid = valids[slot] & keep
    return (xyzs.at[slot].set(xyz), nrms.at[slot].set(nrm),
            depths.at[slot].set(d), valids.at[slot].set(valid),
            xyzs_h.at[slot].set(xyz[::2, ::2]),
            nrms_h.at[slot].set(nrm[::2, ::2]),
            valids_h.at[slot].set(valid[::2, ::2]),
            jnp.sum(valid.astype(jnp.int32)))


@jax.jit
def covis_slots(xyzs, nrms, valids, slots, Ts, thres_cos):
    """Covisibility for a batch of (source slot, A_in_B transform) items
    in one dispatch (ref Frame.h:122-165, stride-2 loop :142-165).
    @slots: (P,) int32; @Ts: (P,4,4). Returns (P,) fractions.
    Pass the pool's HALF-RES pyramid (xyzs_h/nrms_h/valids_h): the ref's
    stride-2 sampling is exactly that decimation."""
    return covis_core(xyzs, nrms, valids, slots, Ts, thres_cos)


def covis_core(xyzs, nrms, valids, slots, Ts, thres_cos):
    """Traceable covisibility core (shared with the BA+admission fused
    program, tracker/ba.py). Expects maps ALREADY at the covisibility
    resolution (the pool's half-res pyramid)."""

    def one(slot, T):
        xyz = xyzs[slot].reshape(-1, 3)
        nrm = nrms[slot].reshape(-1, 3)
        ok = valids[slot].reshape(-1)
        ok = ok & (jnp.linalg.norm(nrm, axis=-1) > 1e-6)
        p = xyz @ T[:3, :3].T + T[:3, 3]
        n = nrm @ T[:3, :3].T
        p_hat = -p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True),
                                 1e-12)
        n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                                1e-12)
        dot = jnp.sum(p_hat * n_hat, axis=-1)
        vis = jnp.sum((dot > thres_cos) & ok)
        return vis.astype(jnp.float32) / (jnp.sum(ok).astype(jnp.float32)
                                          + 1e-7)

    return jax.vmap(one)(slots, Ts)


@functools.partial(jax.jit, static_argnames=("n_trials",))
def lift_ransac_slots(xyzs, nrms, slots_a, slots_b, uvA, uvB, valid, conf,
                      TA, TB, cap_t, cap_r, seed, inlier_dist,
                      cos_normal_angle, n_trials: int = 2000):
    """Fused correspondence lifting + gating + multi-pair RANSAC.

    @slots_a/@slots_b: (P,) pool slots; @uvA/@uvB: (P,M,2) int32 pixel
    coords (clipped in-bounds); @valid: (P,M) raw in-bounds mask;
    @conf: (P,M); @TA/@TB: (P,4,4) current poses (cam-in-model);
    @cap_t/@cap_r: (P,) per-pair RANSAC pose caps; @seed: int32 scalar —
    per-pair RNG keys derive from it in-program (an eager host-side
    split cost 2 device launches per call on the tunnel).

    Returns dict with per-match camera-frame lifts (pA,pB,nA,nB: (P,M,3)),
    the 3D-validity gate `ok` (P,M), RANSAC `inlier_mask` (P,M) and
    `n_inliers` (P,). One dispatch; one host pull gets everything.
    """
    return _lift_ransac_core(xyzs, nrms, slots_a, slots_b, uvA, uvB, valid,
                             conf, TA, TB, cap_t, cap_r, seed, inlier_dist,
                             cos_normal_angle, n_trials)


def _lift_ransac_core(xyzs, nrms, slots_a, slots_b, uvA, uvB, valid, conf,
                      TA, TB, cap_t, cap_r, seed, inlier_dist,
                      cos_normal_angle, n_trials: int):
    key = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(0), seed), slots_a.shape[0])
    cap, H, W, _ = xyzs.shape
    xyz_flat = xyzs.reshape(cap * H * W, 3)
    nrm_flat = nrms.reshape(cap * H * W, 3)

    def rows(slot, uv):
        return slot * (H * W) + uv[:, 1] * W + uv[:, 0]

    def lift(slot, uv):
        r = rows(slot, uv)
        return xyz_flat[r], nrm_flat[r]

    pA, nA = jax.vmap(lift)(slots_a, uvA)  # (P,M,3)
    pB, nB = jax.vmap(lift)(slots_b, uvB)
    ok = valid & (pA[..., 2] > _VALID_MIN) & (pB[..., 2] > _VALID_MIN)

    # model-frame points for RANSAC (ref runRansacMultiPairGPU transforms
    # by the current pose estimates)
    pA_m = jnp.einsum("pij,pmj->pmi", TA[:, :3, :3], pA) + TA[:, None, :3, 3]
    pB_m = jnp.einsum("pij,pmj->pmi", TB[:, :3, :3], pB) + TB[:, None, :3, 3]
    nA_m = jnp.einsum("pij,pmj->pmi", TA[:, :3, :3], nA)
    nB_m = jnp.einsum("pij,pmj->pmi", TB[:, :3, :3], nB)

    fn = functools.partial(ransac_pose, n_trials=n_trials)
    out = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, 0, 0))(
        key, pA_m, pB_m, nA_m, nB_m, conf, ok, inlier_dist,
        cos_normal_angle, cap_t, cap_r)
    return {"pA_cam": pA, "pB_cam": pB, "nA_cam": nA, "nB_cam": nB,
            "ok": ok, "inlier_mask": out["inlier_mask"] & ok,
            "n_inliers": out["n_inliers"]}


def _weighted_mid_eig_ok(pts, w, wsum):
    """Degeneracy gate on an inlier cloud (mirrors the host procrustes
    guard, bundler.py: second principal direction must carry spread).
    Middle eigenvalue of the weighted covariance via two deflated power
    iterations (eigh is a host custom-call on this stack)."""
    mu = jnp.sum(pts * w[:, None], axis=0) / wsum
    X = (pts - mu) * jnp.sqrt(w)[:, None]
    C = X.T @ X / wsum                     # (3,3) weighted covariance

    def power(A):
        v = jnp.array([1.0, 0.2, 0.3], A.dtype)

        def it(_, v):
            v = A @ v
            return v / (jnp.linalg.norm(v) + 1e-20)

        v = jax.lax.fori_loop(0, 40, it, v)
        return v @ A @ v, v

    l1, v1 = power(C)
    l2, _ = power(C - l1 * jnp.outer(v1, v1))
    return l2 >= jnp.maximum(1e-12, 1e-5 * l1)


def _procrustes_and_covis(out, TA, TB, slots_a, xyzs_h, nrms_h, valids_h,
                          covis_thres_cos, sel_kf_poses, sel_kf_slots,
                          sel_extra_slots, sel_extra_Ts, proc_gates):
    """Device procrustes for pair 0 (the (new_frame, ref) match) plus the
    window-selection covisibility at the post-procrustes pose — riding the
    ref-match dispatch (ref: procrustesByCorrespondence
    FeatureManager.cpp:1050-1129 then selectKeyFramesForBA covisibility
    Bundler.cpp:501-526, which the host ran as a separate dispatch+pull).

    @proc_gates: (min_match_with_ref, min_match_after_ransac, kept_cap,
    is_neighbor) f32 scalars. The offset collapses to identity under the
    same conditions the host logic would not apply it (too few kept
    matches -> FAIL/re-localization; degenerate inlier cloud; neighbor
    residual guard), so the covisibility is evaluated at exactly the pose
    the host will adopt on the steady path."""
    from bundlesdf_tpu.utils.se3 import kabsch

    min_ref, min_after, kept_cap, is_nb = proc_gates
    w = (out["inlier_mask"][0] & out["ok"][0]).astype(jnp.float32)
    n_in = jnp.sum(w)
    TA0, TB0 = TA[0], TB[0]
    src = out["pA_cam"][0] @ TA0[:3, :3].T + TA0[:3, 3]
    dst = out["pB_cam"][0] @ TB0[:3, :3].T + TB0[:3, 3]
    T_off = kabsch(src, dst, weights=w)
    wsum = n_in + 1e-9
    # residual guard (host: ||src@R.T+t - dst||_F / n > 1e-3 between
    # temporal neighbors rejects the pose)
    diff = src @ T_off[:3, :3].T + T_off[:3, 3] - dst
    err = jnp.sqrt(jnp.sum(w * jnp.sum(diff * diff, -1))) / wsum
    use = ((jnp.minimum(n_in, kept_cap) >= min_ref)
           & (n_in >= jnp.maximum(min_after, 5.0))
           & _weighted_mid_eig_ok(src, w, wsum)
           & _weighted_mid_eig_ok(dst, w, wsum)
           & ~((is_nb > 0) & (err > 1e-3)))
    T_off = jnp.where(use, T_off, jnp.eye(4, dtype=T_off.dtype))
    new_pose = T_off @ TA0
    Ts_kf = jnp.linalg.inv(sel_kf_poses) @ new_pose  # nf cam -> kf cam
    src_slots = jnp.full(sel_kf_slots.shape, slots_a[0])
    covis_kf = covis_core(xyzs_h, nrms_h, valids_h, src_slots, Ts_kf,
                          covis_thres_cos)
    res = {"proc_offset": T_off, "proc_use": use, "proc_err": err,
           "covis_kf": covis_kf}
    if sel_extra_slots is not None:
        res["covis_extra"] = covis_core(xyzs_h, nrms_h, valids_h,
                                        sel_extra_slots, sel_extra_Ts,
                                        covis_thres_cos)
    return res


@functools.partial(jax.jit, static_argnames=("ratio", "nbits", "m_cap",
                                             "n_trials", "k_pull",
                                             "ratio_loose", "min_strict"))
def orb_lift_ransac_slots(xyzs, nrms, bitsA, bitsB, uvfA, uvfB, nA, nB,
                          slots_a, slots_b, TA, TB, cap_t, cap_r, seed,
                          inlier_dist, cos_normal_angle, ratio: float,
                          nbits: int, m_cap: int, n_trials: int = 2000,
                          k_pull: int = 0, xyzs_h=None, nrms_h=None,
                          valids_h=None, covis_thres_cos=None,
                          ratio_loose: float = 0.0, min_strict: int = 0,
                          sel_kf_slots=None, sel_kf_poses=None,
                          sel_extra_slots=None, sel_extra_Ts=None,
                          proc_gates=None):
    """The WHOLE find_corres device path as one program: batched MXU ORB
    matching (mutual ratio test) -> top-`m_cap` match selection by
    confidence -> correspondence lifting from the pool -> 3D gating ->
    multi-pair RANSAC. One dispatch + one host pull per find_corres call
    (the split matcher/lifter paid 2 dispatches + 2 pulls = ~4 tunnel
    RTTs per call).

    @bitsA/@bitsB: length-P tuples of (F,nbits) +/-1 int8 descriptor
    expansions (device-cached per frame); @uvfA/@uvfB: length-P tuples of
    (F,2) float32 full-res keypoint coords; @nA/@nB: (P,) real feature
    counts. Other args as `lift_ransac_slots`.

    Returns the lift_ransac_slots dict plus `uvA`/`uvB` (P,m_cap,2) int32
    matched pixel coords, `conf` (P,m_cap), and `n_raw` (P,) pre-RANSAC
    match counts (the min_match_with_ref FAIL gate input).

    With @k_pull > 0 the result is instead COMPACTED on device to the
    post-RANSAC inliers (top-k_pull by confidence, uv as int16) — the
    pull shrinks ~5x (uvA/uvB/conf/pA_cam/pB_cam for k_pull rows plus
    counts), which matters because the dev tunnel moves ~30 MB/s: the
    full (P=16, M=1024) dict costs ~1.3 MB ~= 70 ms per pull.
    """
    from bundlesdf_tpu.matcher.classical import orb_match_core

    match = orb_match_core(jnp.stack(bitsA), jnp.stack(bitsB), nA, nB,
                           ratio, nbits, ratio_loose, min_strict)
    conf_all = jnp.where(match["ok"],
                         1.0 / (1.0 + match["dist"] / 64.0), 0.0)  # (P,F)
    n_raw = jnp.sum(match["ok"], axis=1).astype(jnp.int32)
    conf, sel = jax.lax.top_k(conf_all, m_cap)                     # (P,M)
    valid = conf > 0
    uvA_f = jnp.take_along_axis(jnp.stack(uvfA), sel[..., None], axis=1)
    j_sel = jnp.take_along_axis(match["j"], sel, axis=1)
    uvB_f = jnp.take_along_axis(jnp.stack(uvfB), j_sel[..., None], axis=1)
    H, W = xyzs.shape[1:3]
    hi = jnp.array([W - 1, H - 1], jnp.int32)
    uvA = jnp.clip(jnp.round(uvA_f).astype(jnp.int32), 0, hi)
    uvB = jnp.clip(jnp.round(uvB_f).astype(jnp.int32), 0, hi)
    out = _lift_ransac_core(xyzs, nrms, slots_a, slots_b, uvA, uvB, valid,
                            conf, TA, TB, cap_t, cap_r, seed, inlier_dist,
                            cos_normal_angle, n_trials)
    # ref-match extras: device procrustes + selection covisibility at the
    # post-procrustes pose, one fewer dispatch+pull per steady frame
    sel = None
    if sel_kf_slots is not None:
        sel = _procrustes_and_covis(out, TA, TB, slots_a, xyzs_h, nrms_h,
                                    valids_h, covis_thres_cos,
                                    sel_kf_poses, sel_kf_slots,
                                    sel_extra_slots, sel_extra_Ts,
                                    proc_gates)
    # per-pair covisibility riding the same program (the non-neighbor
    # match-pair gate, ref getFeatureMatchPairs — a separate dispatch
    # whenever the window-selection cache misses): source = frame A,
    # T = inv(poseB) @ poseA, evaluated on the half-res pyramid
    covis = None
    if xyzs_h is not None and sel_kf_slots is None:
        Ts = jnp.linalg.inv(TB) @ TA
        covis = covis_core(xyzs_h, nrms_h, valids_h, slots_a, Ts,
                           covis_thres_cos)
    if k_pull <= 0:
        out.update(uvA=uvA, uvB=uvB, conf=conf, n_raw=n_raw)
        if covis is not None:
            out["covis"] = covis
        if sel is not None:
            out.update(sel)
        return out
    score = jnp.where(out["inlier_mask"], conf, 0.0)
    sc, order = jax.lax.top_k(score, min(k_pull, conf.shape[1]))

    def take(a):
        idx = order[..., None] if a.ndim == 3 else order
        return jnp.take_along_axis(a, idx, axis=1)

    # nA_cam/nB_cam are omitted: no consumer reads match-table normals
    # (BA sparse term uses pA/pB only; dense normals come from the pool),
    # and they were 40% of the pull bytes
    res = {"uvA": take(uvA).astype(jnp.int16),
           "uvB": take(uvB).astype(jnp.int16),
           "conf": sc,
           "pA_cam": take(out["pA_cam"]), "pB_cam": take(out["pB_cam"]),
           "n_in": jnp.sum(out["inlier_mask"], axis=1).astype(jnp.int32),
           "n_inliers": out["n_inliers"], "n_raw": n_raw}
    if covis is not None:
        res["covis"] = covis
    if sel is not None:
        res.update(sel)
    return res


@jax.jit
def gather_slots(arr, slots):
    """Stack pool slots (for the BA map pre-pass): arr[slots]."""
    return arr[slots]


@jax.jit
def _slice_maps(depths, xyzs, nrms, slot):
    return depths[slot], xyzs[slot], nrms[slot]


class FramePool:
    """Fixed-capacity stacked frame maps on device; host-side slot
    bookkeeping. All arrays are float32 (bf16 xyz would cost ~2 mm at
    0.5 m — too coarse against the 5 mm RANSAC inlier gate)."""

    def __init__(self, H, W, cap=16):
        self.H, self.W = H, W
        self.cap = cap
        self.xyzs = jnp.zeros((cap, H, W, 3), jnp.float32)
        self.nrms = jnp.zeros((cap, H, W, 3), jnp.float32)
        self.depths = jnp.zeros((cap, H, W), jnp.float32)
        self.valids = jnp.zeros((cap, H, W), bool)
        # half-res strided pyramid (== arr[:, ::2, ::2]): covisibility and
        # BA read these instead of gathering + striding the full maps
        Hh, Wh = -(-H // 2), -(-W // 2)
        self.xyzs_h = jnp.zeros((cap, Hh, Wh, 3), jnp.float32)
        self.nrms_h = jnp.zeros((cap, Hh, Wh, 3), jnp.float32)
        self.valids_h = jnp.zeros((cap, Hh, Wh), bool)
        # grey intensity maps for the dense photometric BA term
        # (BAConfig.w_dense_color; reference CUDACache intensity pyramid).
        # Lazily allocated by set_grey — zero memory when the term is off.
        self.greys = None
        self.greys_h = None
        self.slot_of: dict[int, int] = {}
        self._free = list(range(cap))

    def _alloc(self, frame_id: int) -> int:
        if not self._free:
            self._grow()
        slot = self._free.pop()
        self.slot_of[frame_id] = slot
        return slot

    def _grow(self):
        """Double capacity (one device realloc; kernels recompile at the
        new cap — rare, amortized)."""
        new_cap = self.cap * 2
        pad = new_cap - self.cap
        self.xyzs = jnp.concatenate(
            [self.xyzs, jnp.zeros((pad, self.H, self.W, 3), jnp.float32)])
        self.nrms = jnp.concatenate(
            [self.nrms, jnp.zeros((pad, self.H, self.W, 3), jnp.float32)])
        self.depths = jnp.concatenate(
            [self.depths, jnp.zeros((pad, self.H, self.W), jnp.float32)])
        self.valids = jnp.concatenate(
            [self.valids, jnp.zeros((pad, self.H, self.W), bool)])
        Hh, Wh = self.xyzs_h.shape[1:3]
        self.xyzs_h = jnp.concatenate(
            [self.xyzs_h, jnp.zeros((pad, Hh, Wh, 3), jnp.float32)])
        self.nrms_h = jnp.concatenate(
            [self.nrms_h, jnp.zeros((pad, Hh, Wh, 3), jnp.float32)])
        self.valids_h = jnp.concatenate(
            [self.valids_h, jnp.zeros((pad, Hh, Wh), bool)])
        if self.greys is not None:
            self.greys = jnp.concatenate(
                [self.greys, jnp.zeros((pad, self.H, self.W), jnp.float32)])
            self.greys_h = jnp.concatenate(
                [self.greys_h, jnp.zeros((pad, Hh, Wh), jnp.float32)])
        self._free.extend(range(self.cap, new_cap))
        self.cap = new_cap

    def release(self, frame_id: int):
        slot = self.slot_of.pop(frame_id, None)
        if slot is not None:
            self._free.append(slot)

    # -- writes ------------------------------------------------------------

    def insert_preprocessed(self, frame_id, depth, K, mask, dp_cfg):
        """Run the fused preprocess+write+count program for a new frame.
        Returns (slot, n_valid device scalar)."""
        slot = self._alloc(frame_id)
        (self.xyzs, self.nrms, self.depths, self.valids,
         self.xyzs_h, self.nrms_h, self.valids_h,
         n_valid) = preprocess_into_pool(
            self.xyzs, self.nrms, self.depths, self.valids,
            self.xyzs_h, self.nrms_h, self.valids_h, slot,
            jnp.asarray(np.asarray(depth, np.float32)),
            jnp.asarray(np.asarray(K, np.float32)),  # host-side dtype cast:
            # jnp.asarray(x, dtype) on a f64 input is an eager device
            # convert_element_type launch
            jnp.asarray(mask),
            erode_radius=int(dp_cfg["erode"]["radius"]),
            erode_diff=dp_cfg["erode"]["diff"],
            erode_ratio=dp_cfg["erode"]["ratio"],
            bf_radius=int(dp_cfg["bilateral_filter"]["radius"]),
            sigma_d=dp_cfg["bilateral_filter"]["sigma_D"],
            sigma_r=dp_cfg["bilateral_filter"]["sigma_R"],
            zfar=dp_cfg["zfar"],
            edge_angle_thres_rad=dp_cfg["edge_normal_thres"]
            * math.pi / 180.0)
        return slot, n_valid

    def insert_maps(self, frame_id, depth, xyz, nrm, valid):
        """Adopt already-preprocessed maps (legacy/standalone frames)."""
        slot = self._alloc(frame_id)
        xyz = jnp.asarray(xyz, jnp.float32)
        nrm = jnp.asarray(nrm, jnp.float32)
        valid = jnp.asarray(valid)
        self.xyzs = self.xyzs.at[slot].set(xyz)
        self.nrms = self.nrms.at[slot].set(nrm)
        self.depths = self.depths.at[slot].set(
            jnp.asarray(depth, jnp.float32))
        self.valids = self.valids.at[slot].set(valid)
        self.xyzs_h = self.xyzs_h.at[slot].set(xyz[::2, ::2])
        self.nrms_h = self.nrms_h.at[slot].set(nrm[::2, ::2])
        self.valids_h = self.valids_h.at[slot].set(valid[::2, ::2])
        return slot

    def set_grey(self, frame_id, grey):
        """Store a frame's grey intensity map (0..1 f32) for the dense
        photometric BA term. The half-res twin is a centered separable
        [1,2,1]/4 pyramid step — the antialias the reference gets from its
        filtered intensity pyramid (CUDACache intensityFiltered). The odd
        centered kernel keeps half-res sample i at full pixel 2i exactly,
        matching the strided geometry grid (a 2x2 box mean would shift the
        grey grid by half a pixel against K_down and bias the term)."""
        slot = self.slot_of[frame_id]
        H, W = self.H, self.W
        g = np.asarray(grey, np.float32)
        assert g.shape == (H, W), (g.shape, (H, W))
        if self.greys is None:
            Hh, Wh = self.xyzs_h.shape[1:3]
            self.greys = jnp.zeros((self.cap, H, W), jnp.float32)
            self.greys_h = jnp.zeros((self.cap, Hh, Wh), jnp.float32)
        gp = np.pad(g, ((1, 1), (1, 1)), mode="edge")
        sm = (gp[:-2] + 2.0 * gp[1:-1] + gp[2:]) * 0.25
        sm = (sm[:, :-2] + 2.0 * sm[:, 1:-1] + sm[:, 2:]) * 0.25
        gh = sm[::2, ::2]
        self.greys = self.greys.at[slot].set(jnp.asarray(g))
        self.greys_h = self.greys_h.at[slot].set(
            jnp.asarray(gh.astype(np.float32)))

    def apply_mask(self, frame_id, mask):
        slot = self.slot_of[frame_id]
        (self.xyzs, self.nrms, self.depths, self.valids,
         self.xyzs_h, self.nrms_h, self.valids_h,
         n_valid) = mask_pool_slot(self.xyzs, self.nrms, self.depths,
                                   self.valids, self.xyzs_h, self.nrms_h,
                                   self.valids_h, slot, jnp.asarray(mask))
        return n_valid

    # -- reads -------------------------------------------------------------

    def host_maps(self, frame_id):
        """Pull one frame's maps to host (keyframe->NOF feed, offline and
        debug paths): ONE sliced program + ONE transfer — three eager
        `arr[slot]` reads were 6 launches and 3 pulls on the tunnel."""
        slot = self.slot_of[frame_id]
        d, x, n = jax.device_get(_slice_maps(
            self.depths, self.xyzs, self.nrms, np.int32(slot)))
        return np.asarray(d), np.asarray(x), np.asarray(n)
