"""Bundler: keyframe pool, correspondence store, per-frame tracking pipeline.

Python re-design of the reference C++ `Bundler` (`Bundler.cpp`) plus the
live-path pieces of `SiftManager`/`GluNet` (`FeatureManager.cpp`): the
pipeline control flow (FAIL cascade, ref reselection, keyframe admission,
BA window selection) is host-side; per-pair geometry (correspondence
lifting/gating, RANSAC, covisibility, bundle adjustment) dispatches to
batched jitted kernels.
"""
from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from bundlesdf_tpu.tracker.ba import BAConfig, bundle_adjust, downsample_maps
from bundlesdf_tpu.tracker.frame import Frame, FrameStatus
from bundlesdf_tpu.tracker.ransac import ransac_pose
from bundlesdf_tpu.utils.se3 import kabsch, rot_geodesic_ignore_cam_z


def _pad_to(arr, n, fill=0.0):
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr[:n]
    width = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, width, constant_values=fill)


def _round_up(n, base=256):
    return max(base, -(-n // base) * base)


@jax.jit
def _lift_uv(xyz, nrm, uv, valid):
    """Gather 3D points/normals for pixel matches on device (replaces the
    host-side map reads; map pulls over the TPU tunnel cost seconds)."""
    u = uv[:, 0]
    v = uv[:, 1]
    p = xyz[v, u]
    n = nrm[v, u]
    ok = valid & (p[:, 2] > 0.1)
    return p, n, ok


@functools.partial(jax.jit, static_argnames=())
def _kabsch_masked(src, dst, w):
    return kabsch(src, dst, weights=w)


@jax.jit
def _covis_many(xyz, nrm, valid, A_in_Bs, thres_cos):
    """Covisibility of one frame against many keyframe transforms in one
    dispatch (ref Frame.h:122-165). @A_in_Bs: (K,4,4)."""
    pts = xyz[::2, ::2].reshape(-1, 3)
    nr = nrm[::2, ::2].reshape(-1, 3)
    ok = valid[::2, ::2].reshape(-1) & (jnp.linalg.norm(nr, axis=-1) > 1e-6)

    def one(T):
        p = pts @ T[:3, :3].T + T[:3, 3]
        n = nr @ T[:3, :3].T
        p_hat = -p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True),
                                 1e-12)
        n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                                1e-12)
        dot = jnp.sum(p_hat * n_hat, axis=-1)
        vis = jnp.sum((dot > thres_cos) & ok)
        return vis.astype(jnp.float32) / (jnp.sum(ok).astype(jnp.float32)
                                          + 1e-7)

    return jax.vmap(one)(A_in_Bs)


class Bundler:
    """@cfg: tracker config dict (schema of config_ho3d.yml).
    @matcher: object with predict(imgA_batch, imgB_batch) -> list of (N,5)
    [uA,vA,uB,vB,conf] arrays (the LoFTR-wrapper contract,
    loftr_wrapper.py:28-82)."""

    # fixed device-kernel shapes: every new (pairs, matches) size bucket
    # costs a full XLA recompile (tens of seconds through the tunnel), so
    # matches are capped/padded to MATCH_CAP and RANSAC runs in fixed
    # PAIR_CHUNK batches — each kernel compiles exactly once per run
    MATCH_CAP = 1024
    PAIR_CHUNK = 8

    def __init__(self, cfg, matcher=None):
        self.cfg = cfg
        self.matcher = matcher
        self.frames: dict[int, Frame] = {}
        self.keyframes: list[Frame] = []
        self.first_frame: Frame | None = None
        self.new_frame: Frame | None = None
        self.local_frames: list[Frame] = []
        # (idA,idB) -> dict of match arrays; idA > idB always
        self.matches: dict[tuple[int, int], dict] = {}
        # frame_id -> {(u,v) -> map point track {frame_id: (u,v)}}
        self._map_points: dict[int, dict] = {}
        self._rng = np.random.default_rng(0)
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    # covisibility (ref Frame.h:122-165 via ops kernel)
    # ------------------------------------------------------------------
    def covisibility(self, fA: Frame, fB: Frame) -> float:
        return self.covisibility_many(fA, [fB])[0]

    def covisibility_many(self, fA: Frame, fBs: list) -> np.ndarray:
        """Covisibility of fA against many frames in ONE device dispatch
        (per-call tunnel latency dominates otherwise). The transform batch
        is padded to a multiple of 8 so the kernel compiles once per
        bucket, not per keyframe count."""
        K = -(-max(len(fBs), 1) // 8) * 8
        Ts = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        for i, fB in enumerate(fBs):
            Ts[i] = (np.linalg.inv(fB.pose_in_model)
                     @ fA.pose_in_model).astype(np.float32)
        valid = (fA.depth_dev > 0.1) & (jnp.asarray(fA.fg_mask) > 0)
        thres = float(np.cos(np.deg2rad(self.cfg["visible_angle"])))
        out = np.asarray(_covis_many(fA.xyz_dev, fA.normal_dev, valid,
                                     jnp.asarray(Ts), thres))
        return out[:len(fBs)]

    # ------------------------------------------------------------------
    # correspondence construction (ref rawMatchesToCorres + makeCorrespondence
    # FeatureManager.cpp:1545-1584, 2720-2769)
    # ------------------------------------------------------------------
    def raw_matches_to_corres(self, fA: Frame, fB: Frame, uv):
        """@uv: (N,>=4) [uA,vA,uB,vB(,conf)] full-resolution pixel matches.
        Lifts to 3D with validity gating (device gather; only the small
        match arrays cross to host); stores the match table."""
        key = (fA.id, fB.id)
        if uv is None or len(uv) == 0:
            self.matches[key] = None
            return
        uv = np.asarray(uv)
        uA = np.round(uv[:, 0]).astype(np.int32)
        vA = np.round(uv[:, 1]).astype(np.int32)
        uB = np.round(uv[:, 2]).astype(np.int32)
        vB = np.round(uv[:, 3]).astype(np.int32)
        conf = (uv[:, 4] if uv.shape[1] > 4
                else np.ones(len(uv))).astype(np.float32)
        inb = ((uA >= 0) & (uA < fA.W) & (vA >= 0) & (vA < fA.H)
               & (uB >= 0) & (uB < fB.W) & (vB >= 0) & (vB < fB.H))
        if len(uv) > self.MATCH_CAP:  # keep the most confident
            order = np.argsort(-conf)[:self.MATCH_CAP]
            uv = uv[order]
            uA, vA, uB, vB = uA[order], vA[order], uB[order], vB[order]
            conf, inb = conf[order], inb[order]
        M = self.MATCH_CAP
        uvA_p = _pad_to(np.stack([uA, vA], -1), M).astype(np.int32)
        uvB_p = _pad_to(np.stack([uB, vB], -1), M).astype(np.int32)
        valid_p = jnp.asarray(_pad_to(inb, M, False))
        pA, nA, okA = _lift_uv(fA.xyz_dev, fA.normal_dev,
                               jnp.asarray(np.clip(uvA_p, 0,
                                                   [fA.W - 1, fA.H - 1])),
                               valid_p)
        pB, nB, okB = _lift_uv(fB.xyz_dev, fB.normal_dev,
                               jnp.asarray(np.clip(uvB_p, 0,
                                                   [fB.W - 1, fB.H - 1])),
                               valid_p)
        ok = np.asarray(okA & okB)
        pA = np.asarray(pA)[ok]
        pB = np.asarray(pB)[ok]
        nA = np.asarray(nA)[ok]
        nB = np.asarray(nB)[ok]
        keep = ok[:len(uv)]
        self.matches[key] = {
            "uvA": np.stack([uA, vA], -1)[keep],
            "uvB": np.stack([uB, vB], -1)[keep],
            "pA_cam": pA, "pB_cam": pB, "nA_cam": nA, "nB_cam": nB,
            "conf": conf[keep],
        }

    def n_matches(self, fA: Frame, fB: Frame) -> int:
        m = self.matches.get((fA.id, fB.id))
        return 0 if m is None else len(m["conf"])

    # ------------------------------------------------------------------
    # map points: persistent multi-frame feature tracks
    # (ref updateFramePairMapPoints FeatureManager.cpp:854-891 and
    # findCorresByMapPoints :939-970; enabled by feature_corres.map_points)
    # ------------------------------------------------------------------
    def update_map_points(self, fA: Frame, fB: Frame):
        """Merge the (post-RANSAC) inlier matches of a pair into map-point
        tracks. A map point is a dict {frame_id: (u,v)} shared via each
        frame's `map_points` registry."""
        m = self.matches.get((fA.id, fB.id))
        if m is None or len(m["conf"]) == 0:
            return
        regA = self._map_points.setdefault(fA.id, {})
        regB = self._map_points.setdefault(fB.id, {})
        for (uA, vA), (uB, vB) in zip(map(tuple, m["uvA"]),
                                      map(tuple, m["uvB"])):
            if (uA, vA) in regA and (uB, vB) in regB:
                continue
            mpt = regB.get((uB, vB))
            if mpt is None:
                mpt = {fB.id: (uB, vB)}
                regB[(uB, vB)] = mpt
            mpt[fA.id] = (uA, vA)
            regA[(uA, vA)] = mpt

    def propagate_matches(self, fA: Frame, fB: Frame):
        """uv matches implied by shared map points (marked propagated in
        the reference; used to seed/augment pair matching). Returns
        (P,5) [uA,vA,uB,vB,conf] or empty."""
        regA = self._map_points.get(fA.id, {})
        rows = []
        for (uA, vA), mpt in regA.items():
            if fB.id in mpt:
                uB, vB = mpt[fB.id]
                rows.append([uA, vA, uB, vB, 1.0])
        return np.asarray(rows, np.float32).reshape(-1, 5)

    # ------------------------------------------------------------------
    # RANSAC filtering (ref runRansacMultiPairGPU FeatureManager.cpp:1587)
    # ------------------------------------------------------------------
    def run_ransac(self, pairs):
        cfg = self.cfg["ransac"]
        live = [(fA, fB, self.matches[(fA.id, fB.id)]) for fA, fB in pairs
                if self.matches.get((fA.id, fB.id)) is not None
                and len(self.matches[(fA.id, fB.id)]["conf"]) > 0]
        if not live:
            return
        # all pairs share one padded batch -> ONE device dispatch per fixed
        # PAIR_CHUNK (per-pair calls pay the tunnel latency each); fixed
        # (PAIR_CHUNK, MATCH_CAP) shapes compile exactly once
        M = self.MATCH_CAP
        P = -(-len(live) // self.PAIR_CHUNK) * self.PAIR_CHUNK
        pA = np.zeros((P, M, 3), np.float32)
        pB = np.zeros((P, M, 3), np.float32)
        nA = np.zeros((P, M, 3), np.float32)
        nB = np.zeros((P, M, 3), np.float32)
        conf = np.zeros((P, M), np.float32)
        valid = np.zeros((P, M), bool)
        caps = np.zeros((P, 2), np.float32)
        for i, (fA, fB, m) in enumerate(live):
            TA, TB = fA.pose_in_model, fB.pose_in_model
            n = len(m["conf"])
            pA[i, :n] = m["pA_cam"] @ TA[:3, :3].T + TA[:3, 3]
            pB[i, :n] = m["pB_cam"] @ TB[:3, :3].T + TB[:3, 3]
            nA[i, :n] = m["nA_cam"] @ TA[:3, :3].T
            nB[i, :n] = m["nB_cam"] @ TB[:3, :3].T
            conf[i, :n] = m["conf"]
            valid[i, :n] = True
            if fA.ref_frame_id == fB.id and fA.id == fB.id + 1:
                caps[i] = (cfg["max_trans_neighbor"],
                           np.deg2rad(cfg["max_rot_deg_neighbor"]))
            elif fA.ref_frame_id != fB.id:
                caps[i] = (cfg["max_trans_no_neighbor"],
                           np.deg2rad(cfg["max_rot_no_neighbor"]))
            else:
                caps[i] = (np.inf, np.inf)

        self._key, k = jax.random.split(self._key)
        keys = np.asarray(jax.random.split(k, P))
        fn = functools.partial(ransac_pose, n_trials=int(cfg["max_iter"]))
        vfn = jax.vmap(fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, 0, 0))
        chunks = []
        for s in range(0, P, self.PAIR_CHUNK):
            e = s + self.PAIR_CHUNK
            out = vfn(jnp.asarray(keys[s:e]), jnp.asarray(pA[s:e]),
                      jnp.asarray(pB[s:e]), jnp.asarray(nA[s:e]),
                      jnp.asarray(nB[s:e]), jnp.asarray(conf[s:e]),
                      jnp.asarray(valid[s:e]), cfg["inlier_dist"],
                      float(np.cos(np.deg2rad(cfg["inlier_normal_angle"]))),
                      jnp.asarray(caps[s:e, 0]), jnp.asarray(caps[s:e, 1]))
            chunks.append(np.asarray(out["inlier_mask"]))
        inlier_all = np.concatenate(chunks, axis=0)

        for i, (fA, fB, m) in enumerate(live):
            inlier = inlier_all[i, :len(m["conf"])]
            if inlier.sum() < cfg["min_match_after_ransac"]:
                logging.info(f"ransac {fA.id_str}-{fB.id_str}: "
                             f"{int(inlier.sum())} inliers, cleared")
                self.matches[(fA.id, fB.id)] = None
                continue
            self.matches[(fA.id, fB.id)] = {k2: v[inlier]
                                            for k2, v in m.items()}

    # ------------------------------------------------------------------
    # pose from correspondences (ref procrustesByCorrespondence
    # FeatureManager.cpp:1050-1129)
    # ------------------------------------------------------------------
    def procrustes(self, fA: Frame, fB: Frame):
        m = self.matches.get((fA.id, fB.id))
        if m is None or len(m["conf"]) < 5:
            return np.eye(4)
        TA = fA.pose_in_model
        TB = fB.pose_in_model
        src = m["pA_cam"] @ TA[:3, :3].T + TA[:3, 3]
        dst = m["pB_cam"] @ TB[:3, :3].T + TB[:3, 3]
        # degeneracy guard: (near-)collinear or collapsed inlier sets make
        # Kabsch ill-posed — the reference relies on its SVD solver returning
        # identity for degenerate input (Utils.cpp:360-404); we detect rank
        # deficiency of the centered cloud directly
        for cloud in (src, dst):
            ev = np.linalg.eigvalsh(np.cov(cloud.T))
            # a (near-)line or point leaves rotation about the line axis
            # unconstrained: second principal direction must carry spread
            if ev[1] < max(1e-12, 1e-5 * ev[2]):
                logging.info(f"procrustes {fA.id_str}-{fB.id_str}: "
                             f"degenerate inlier set ({ev}), identity")
                return np.eye(4)
        # pad to the shared cap so the jitted solve compiles once
        M = self.MATCH_CAP
        w = _pad_to(np.ones(len(src), np.float32), M)
        T = np.asarray(_kabsch_masked(
            jnp.asarray(_pad_to(src, M), jnp.float32),
            jnp.asarray(_pad_to(dst, M), jnp.float32),
            jnp.asarray(w)), np.float64)
        # residual guard (ref procrustesByCorrespondence
        # FeatureManager.cpp:1095-1127: ||src_est-dst||/n > 1e-3 between
        # temporal neighbors pauses with debug dumps — note the reference's
        # `frameB->_id-frameA->_id==1` is dead code since frameA.id>frameB.id
        # is asserted; this is the intended live check. Headless: log +
        # identity so the FAIL cascade handles it instead of a garbage pose)
        err = float(np.linalg.norm(src @ T[:3, :3].T + T[:3, 3] - dst)
                    / max(len(src), 1))
        if fA.id - fB.id == 1 and err > 1e-3:
            logging.warning(f"procrustes {fA.id_str}-{fB.id_str}: residual "
                            f"{err:.5f} > 1e-3, rejecting pose")
            return np.eye(4)
        return T

    # ------------------------------------------------------------------
    # keyframe admission (ref checkAndAddKeyframe Bundler.cpp:263-323)
    # ------------------------------------------------------------------
    def check_and_add_keyframe(self, frame: Frame) -> bool:
        if frame.id == 0:
            self.keyframes.append(frame)
            return True
        if frame.status != FrameStatus.OTHER:
            return False
        kf_cfg = self.cfg["keyframe"]
        n_valid = frame.count_valid_points()
        if n_valid < self.first_frame.count_valid_points() / 10.0:
            return False
        min_rot = np.deg2rad(kf_cfg["min_rot"])
        for kf in self.keyframes:
            # camera rotation diversity ignoring roll around camera Z
            rot_diff = float(rot_geodesic_ignore_cam_z(
                jnp.asarray(frame.pose_in_model[:3, :3].T),
                jnp.asarray(kf.pose_in_model[:3, :3].T)))
            if rot_diff < min_rot:
                return False
        vis = self.covisibility_many(frame, self.keyframes)
        if (vis > kf_cfg["min_visible"]).any():
            return False
        self.keyframes.append(frame)
        logging.info(f"added keyframe {frame.id_str}, "
                     f"#keyframes={len(self.keyframes)}")
        return True

    # ------------------------------------------------------------------
    # BA window selection (ref selectKeyFramesForBA Bundler.cpp:430-609):
    # default normal_orientation_nearest plus the 5 alternate strategies
    # ------------------------------------------------------------------
    def _rot_dist_ignore_z(self, fA: Frame, fB: Frame) -> float:
        return float(rot_geodesic_ignore_cam_z(
            jnp.asarray(fA.pose_in_model[:3, :3].T),
            jnp.asarray(fB.pose_in_model[:3, :3].T)))

    def _n_shared_map_points(self, fA: Frame, fB: Frame) -> int:
        """Count map points observed by both frames (ref
        getCovisibleMapPoints, used by greedy_covisible_points)."""
        reg = self._map_points.get(fA.id, {})
        return sum(1 for mpt in reg.values() if fB.id in mpt)

    def select_keyframes_for_ba(self):
        max_ba = self.cfg["bundle"]["max_BA_frames"]
        if len(self.keyframes) + 1 <= max_ba:
            frames = [self.new_frame] + [kf for kf in self.keyframes
                                         if kf is not self.new_frame]
            frames.sort(key=lambda f: f.id)
            self.local_frames = frames
            return

        method = self.cfg["bundle"].get("subset_selection_method",
                                        "normal_orientation_nearest")
        nf = self.new_frame
        kf0 = self.keyframes[0]
        pool = [kf for kf in self.keyframes if kf is not nf]

        if method == "normal_orientation_nearest":
            # covisibility with the new frame, descending (ref :501-526)
            frames = {nf}
            scores = self.covisibility_many(nf, pool)
            for i in np.argsort(-scores):
                frames.add(pool[i])
                if len(frames) == max_ba:
                    break
        elif method == "nearest_rotations":
            # rot distance (ignoring cam-Z roll) to the new frame, ascending
            # (ref :474-499)
            frames = {nf}
            dists = [self._rot_dist_ignore_z(nf, kf) for kf in pool]
            for i in np.argsort(dists):
                frames.add(pool[i])
                if len(frames) == max_ba:
                    break
        elif method == "greedy_rot":
            # grow the set by the keyframe with least cumulative rot distance
            # to the current set (ref :449-472); seeded with keyframes[0]
            frames = {nf, kf0}
            while len(frames) < max_ba:
                rest = [kf for kf in pool if kf not in frames]
                if not rest:
                    break
                cum = [sum(self._rot_dist_ignore_z(kf, f) for f in frames)
                       for kf in rest]
                frames.add(rest[int(np.argmin(cum))])
        elif method == "normal_orientation_greedy":
            # grow by max summed covisibility to the current set (ref :528-551)
            frames = {nf, kf0}
            while len(frames) < max_ba:
                rest = [kf for kf in pool if kf not in frames]
                if not rest:
                    break
                sums = np.zeros(len(rest))
                for f in frames:
                    sums += self.covisibility_many(f, rest)
                if sums.max() <= 0:
                    break
                frames.add(rest[int(np.argmax(sums))])
        elif method == "greedy_covisible_points":
            # grow by shared map-point count with {keyframes[0], newframe}
            # (ref :553-577)
            frames = {nf, kf0}
            refs = [kf0, nf]
            while len(frames) < max_ba:
                rest = [kf for kf in pool if kf not in frames]
                if not rest:
                    break
                counts = [sum(self._n_shared_map_points(r, kf) for r in refs)
                          for kf in rest]
                if max(counts) <= 0:
                    break
                frames.add(rest[int(np.argmax(counts))])
        elif method == "max_edge":
            # DFS over match-connected paths keyframes[0] -> newframe,
            # maximizing total match count at size max_BA (ref :579-589 +
            # maxNumEdgePathDfs :612-685). Deviation: edges come from the
            # existing match table — the reference runs the matcher inside
            # the DFS, which it itself flags "Super slow".
            frames = self._max_edge_dfs(kf0, nf, pool, max_ba) or {nf, kf0}
        elif method == "near_enough_rot":
            # smallest set connecting keyframes[0] to newframe where every
            # added frame is within 30deg plain rot geodesic of the set
            # (ref :591-599 + nearEnoughRotSearch :690-746)
            frames = self._near_enough_rot_search(kf0, nf, pool) or {nf, kf0}
        else:
            raise ValueError(
                f"unknown bundle.subset_selection_method {method!r} "
                "(ref Bundler.cpp:604-608 exits here)")

        frames = sorted(frames, key=lambda f: f.id)
        self.local_frames = frames

    def _has_match_edge(self, fA: Frame, fB: Frame) -> bool:
        if fA.id < fB.id:
            fA, fB = fB, fA
        m = self.matches.get((fA.id, fB.id))
        return m is not None and len(m["conf"]) > 0

    def _n_match_edges(self, frames) -> int:
        fl = list(frames)
        tot = 0
        for i in range(len(fl)):
            for j in range(i + 1, len(fl)):
                a, b = ((fl[i], fl[j]) if fl[i].id > fl[j].id
                        else (fl[j], fl[i]))
                m = self.matches.get((a.id, b.id))
                tot += 0 if m is None else len(m["conf"])
        return tot

    def _max_edge_dfs(self, start: Frame, goal: Frame, pool, max_ba):
        pool = pool + [goal]
        best = {"path": None, "n": -1}
        visited = set()

        def dfs(cur, path):
            key = frozenset(f.id for f in path)
            if key in visited:
                return
            visited.add(key)
            if len(path) == max_ba:
                if goal in path:
                    n = self._n_match_edges(path)
                    if n > best["n"]:
                        best["path"], best["n"] = set(path), n
                return
            for kf in pool:
                if kf in path or not self._has_match_edge(cur, kf):
                    continue
                dfs(kf, path | {kf})

        dfs(start, {start})
        return best["path"]

    def _near_enough_rot_search(self, start: Frame, goal: Frame, pool):
        pool = pool + [goal]
        best = {"path": None}
        visited = set()
        near_thres = np.deg2rad(30.0)

        def plain_rot(fA, fB):
            R1 = fA.pose_in_model[:3, :3]
            R2 = fB.pose_in_model[:3, :3]
            return np.arccos(np.clip((np.trace(R1 @ R2.T) - 1) / 2, -1, 1))

        def dfs(cur, path):
            key = frozenset(f.id for f in path)
            if key in visited:
                return
            visited.add(key)
            if best["path"] is not None and len(path) > len(best["path"]):
                return
            if goal in path:
                if best["path"] is None or len(path) < len(best["path"]):
                    best["path"] = set(path)
                return
            for kf in pool:
                if kf in path:
                    continue
                if not any(plain_rot(kf, f) < near_thres for f in path):
                    continue
                dfs(kf, path | {kf})

        dfs(start, {start})
        return best["path"]

    # ------------------------------------------------------------------
    # match-pair gating (ref getFeatureMatchPairs Bundler.cpp:781-807)
    # ------------------------------------------------------------------
    def get_feature_match_pairs(self, frames):
        min_vis = self.cfg["bundle"]["non_neighbor_min_visible"]
        cands = []
        for i in range(len(frames)):
            for j in range(i + 1, len(frames)):
                fA, fB = frames[j], frames[i]
                if (fA.id, fB.id) in self.matches:
                    continue
                if np.allclose(fA.pose_in_model, np.eye(4)):
                    continue
                cands.append((fA, fB))
        pairs = []
        # batch the covisibility gate per source frame (one dispatch each)
        by_fA: dict[int, list] = {}
        for fA, fB in cands:
            by_fA.setdefault(fA.id, (fA, []))[1].append(fB)
        for fA, fBs in by_fA.values():
            vis = self.covisibility_many(fA, fBs)
            for fB, v in zip(fBs, vis):
                if v < min_vis:
                    self.matches[(fA.id, fB.id)] = None
                else:
                    pairs.append((fA, fB))
        return pairs

    # ------------------------------------------------------------------
    # debug artifacts (SPDLOG tiers; ref FeatureManager::vizCorresBetween
    # FeatureManager.cpp:445-464 and OptimizerGpu savePoses LossGPU.cpp:26-46)
    # ------------------------------------------------------------------
    def viz_corres_between(self, fA: Frame, fB: Frame, tag: str):
        """Side-by-side match visualization (SPDLOG>=3)."""
        if int(self.cfg.get("SPDLOG", 1)) < 3:
            return
        import cv2
        m = self.matches.get((fA.id, fB.id))
        canvas = np.concatenate([fA.color, fB.color], axis=1).copy()
        if m is not None and len(m["uvA"]) > 0:
            # deterministic per-match colors from one hash, no RNG objects
            seeds = (m["uvA"][:, 0].astype(np.int64) * 7919
                     + m["uvA"][:, 1].astype(np.int64))
            colors = np.stack([(seeds * p) % 195 + 60
                               for p in (2654435761, 805459861, 40503)],
                              axis=-1).astype(int)
            for (uA, vA), (uB, vB), c in zip(m["uvA"], m["uvB"], colors):
                cv2.line(canvas, (int(uA), int(vA)),
                         (int(uB) + fA.W, int(vB)), tuple(int(x) for x in c),
                         1)
        out_dir = os.path.join(self.cfg["debug_dir"], fA.id_str)
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(
            out_dir, f"corres_{fA.id_str}_{fB.id_str}_{tag}.png"),
            canvas[..., ::-1])

    def _save_ba_poses(self, frames, tag: str):
        """Pre/post-BA pose dumps (SPDLOG>=2)."""
        if int(self.cfg.get("SPDLOG", 1)) < 2 or self.new_frame is None:
            return
        out_dir = os.path.join(self.cfg["debug_dir"], self.new_frame.id_str)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, f"opt_{tag}_poses.txt"), "w") as f:
            for fr in frames:
                np.savetxt(f, fr.pose_in_model)
        with open(os.path.join(out_dir, "opt_frames.txt"), "w") as f:
            f.write(" ".join(fr.id_str for fr in frames))

    # ------------------------------------------------------------------
    # frame eviction (ref forgetFrame + SiftManager::forgetFrame)
    # ------------------------------------------------------------------
    def forget_frame(self, frame: Frame) -> bool:
        if frame in self.keyframes and frame.status != FrameStatus.FAIL:
            return False
        self.frames.pop(frame.id, None)
        if frame in self.keyframes:
            self.keyframes.remove(frame)
        for key in [k for k in self.matches if frame.id in k]:
            del self.matches[key]
        # purge map-point observations (ref SiftManager::forgetFrame
        # FeatureManager.cpp:467-511)
        for mpt in self._map_points.pop(frame.id, {}).values():
            mpt.pop(frame.id, None)
        return True

    # ------------------------------------------------------------------
    # GN bundle adjustment driver (ref optimizeGPU Bundler.cpp:810-956)
    # ------------------------------------------------------------------
    def optimize(self, frames):
        bcfg = self.cfg["bundle"]
        idx_of = {f.id: k for k, f in enumerate(frames)}

        corr_i, corr_j, pi, pj = [], [], [], []
        for a in range(len(frames)):
            for b in range(a + 1, len(frames)):
                fA, fB = frames[b], frames[a]
                m = self.matches.get((fA.id, fB.id))
                if m is None or len(m["conf"]) == 0:
                    continue
                # EntryJ convention: j=frameA index, i=frameB index
                n = len(m["conf"])
                corr_j += [idx_of[fA.id]] * n
                corr_i += [idx_of[fB.id]] * n
                pj.append(m["pA_cam"])
                pi.append(m["pB_cam"])

        if not corr_i:
            logging.info(f"frame {self.new_frame.id_str}: zero global corres,"
                         " FAIL")
            self.new_frame.status = FrameStatus.FAIL
            return

        C = _round_up(len(corr_i))
        corr_i_a = _pad_to(np.array(corr_i, np.int32), C)
        corr_j_a = _pad_to(np.array(corr_j, np.int32), C)
        pi_a = _pad_to(np.concatenate(pi), C)
        pj_a = _pad_to(np.concatenate(pj), C)
        valid = _pad_to(np.ones(len(corr_i), np.float32), C)

        # pad the window to max_BA_frames so the BA kernel compiles once:
        # padded slots get zero maps (no dense residuals) and pinned poses
        N_pad = int(bcfg["max_BA_frames"])
        N = len(frames)
        xyz = jnp.stack([f.xyz_dev for f in frames]
                        + [jnp.zeros_like(frames[0].xyz_dev)] * (N_pad - N))
        nrm = jnp.stack([f.normal_dev for f in frames]
                        + [jnp.zeros_like(frames[0].normal_dev)] * (N_pad - N))
        factor = int(bcfg["image_downscale"][0]
                     if isinstance(bcfg["image_downscale"], (list, tuple))
                     else bcfg["image_downscale"])
        xyz_d, nrm_d, K_d = downsample_maps(xyz, nrm,
                                            frames[0].K.astype(np.float32),
                                            factor)
        pair_ij = np.array([(i, j) for i in range(N_pad) for j in range(N_pad)
                            if i < j], np.int32)
        update_flags = np.zeros(N_pad, np.float32)
        for k, f in enumerate(frames):
            if k > 0 and not f.nerfed:
                update_flags[k] = 1.0

        cfg_ba = BAConfig(
            n_outer=bcfg["num_iter_outter"],
            image_downscale=factor,
            dense_dist_thres=self.cfg["p2p"]["max_dist"],
            dense_normal_thres_deg=self.cfg["p2p"]["max_normal_angle"],
            assoc_radius=int(bcfg["depth_association_radius"]),
            robust_delta=bcfg["robust_delta"],
            w_sparse=bcfg["w_fm"], w_dense=bcfg["w_p2p"])

        # per-frame valid-object-point indices in the downsampled grid: the
        # dense term runs on these D points, not all h*w pixels
        D = cfg_ba.n_dense_pts
        hd, wd = frames[0].fg_mask[::factor, ::factor].shape
        src_idx = np.zeros((N_pad, D), np.int32)
        src_valid = np.zeros((N_pad, D), bool)
        for k, f in enumerate(frames):
            flat = np.nonzero((f.fg_mask[::factor, ::factor] > 0).reshape(-1))[0]
            if len(flat) > D:  # uniform subsample to the budget
                flat = flat[np.linspace(0, len(flat) - 1, D).astype(int)]
            src_idx[k, :len(flat)] = flat
            src_valid[k, :len(flat)] = True

        self._save_ba_poses(frames, "before")
        poses0 = np.stack([f.pose_in_model for f in frames]
                          + [np.eye(4)] * (N_pad - N)).astype(np.float32)
        poses = np.asarray(bundle_adjust(
            jnp.asarray(poses0), K_d, xyz_d, nrm_d, jnp.asarray(pair_ij),
            jnp.asarray(corr_i_a), jnp.asarray(corr_j_a),
            jnp.asarray(pi_a, jnp.float32), jnp.asarray(pj_a, jnp.float32),
            jnp.asarray(valid), jnp.asarray(update_flags),
            jnp.asarray(src_idx), jnp.asarray(src_valid), cfg_ba))

        # abnormal-pose-change rejection vs temporal neighbor
        # (ref Bundler.cpp:927-946)
        nf = self.new_frame
        if nf.ref_frame_id == nf.id - 1 and nf.ref_frame_id in self.frames:
            ref = self.frames[nf.ref_frame_id]
            k_new = idx_of[nf.id]
            new_pose = poses[k_new].astype(np.float64)
            t_new = np.linalg.inv(new_pose)[:3, 3]
            t_ref = np.linalg.inv(ref.pose_in_model)[:3, 3]
            trans_diff = np.linalg.norm(t_new - t_ref)
            R1 = np.linalg.inv(new_pose)[:3, :3]
            R2 = np.linalg.inv(ref.pose_in_model)[:3, :3]
            cosang = np.clip((np.trace(R1 @ R2.T) - 1) / 2, -1, 1)
            rot_diff = np.arccos(cosang)
            if trans_diff > self.cfg["ransac"]["max_trans_neighbor"]:
                logging.info(f"frame {nf.id_str} BA trans jump {trans_diff:.4f}"
                             " too big, FAIL")
                nf.status = FrameStatus.FAIL
                return
            if rot_diff > np.deg2rad(self.cfg["ransac"]["max_rot_deg_neighbor"]):
                logging.info(f"frame {nf.id_str} BA rot jump too big, FAIL")
                nf.status = FrameStatus.FAIL
                return

        for k, f in enumerate(frames):
            f.pose_in_model = poses[k].astype(np.float64)
        self._save_ba_poses(frames, "after")
